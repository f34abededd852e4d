"""HER + DDPG on FetchReach (gymnasium-robotics) — the classic Hindsight
Experience Replay benchmark (Andrychowicz et al. 2017; counterpart of the
reference's HERReplayBuffer usage, data/replay_buffers/her.py:49, on the
goal-conditioned Fetch tasks).

Goal-conditioned observations flow through :class:`GoalGymEnv`; every
collected trajectory is written twice — original and future-strategy
relabeled — and DDPG trains on the sparse recomputed reward.  Run::

    python sota/her_ddpg_fetchreach.py [iters=300]
"""
import sys
import warnings

warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp
import optax

from rl_tpu.collectors import Collector
from rl_tpu.config import apply_overrides
from rl_tpu.data import TDict
from rl_tpu.data.replay import HERReplayBuffer
from rl_tpu.envs.libs import GoalGymEnv
from rl_tpu.modules import MLP, Seq, TanhModule, TDModule
from rl_tpu.objectives import DDPGLoss
from rl_tpu.objectives.common import SoftUpdate
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(
    env_name="FetchReach-v4", num_envs=4, episode_len=50, iters=300,
    batch_size=256, utd=20, lr=1e-3, gamma=0.98, tau=0.05,
    explore_sigma=0.2, her_samples=1, seed=0,
)


def goal_reward(achieved, goal, tol: float = 0.05):
    """Fetch sparse reward: 0 within tolerance, −1 outside."""
    d = jnp.linalg.norm(achieved - goal, axis=-1, keepdims=True)
    return jnp.where(d < tol, 0.0, -1.0)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = GoalGymEnv(cfg["env_name"], num_envs=cfg["num_envs"],
                     max_episode_steps=cfg["episode_len"])
    obs_keys = ["observation", "desired_goal"]
    act_dim = env.action_spec.shape[-1]
    actor = Seq(
        TDModule(MLP(out_features=act_dim, num_cells=(256, 256),
                     activation="relu"), obs_keys, ["pre_action"]),
        TanhModule(in_keys=["pre_action"], out_keys=["action"],
                   low=-1.0, high=1.0),
    )
    qvalue = TDModule(
        MLP(out_features=1, num_cells=(256, 256), activation="relu"),
        obs_keys + ["action"], ["state_action_value"])
    loss_mod = DDPGLoss(actor, qvalue, gamma=cfg["gamma"])
    updater = SoftUpdate(tau=cfg["tau"])

    def explore_policy(p, td, k):
        td = actor(p["actor"], td)
        noise = cfg["explore_sigma"] * jax.random.normal(
            k, jnp.asarray(td["action"]).shape)
        return td.set("action", jnp.clip(td["action"] + noise, -1, 1))

    coll = Collector(env, explore_policy,
                     frames_per_batch=cfg["episode_len"] * cfg["num_envs"])
    rb = HERReplayBuffer(reward_fn=goal_reward, strategy="future",
                         samples_per_traj=cfg["her_samples"],
                         capacity=200_000, seed=cfg["seed"])
    k_init, key = jax.random.split(key)
    _, td0 = env.reset(k_init)
    example = jax.tree.map(lambda x: jnp.asarray(x)[:1], td0)
    example = example.set("action", jnp.zeros((1, act_dim)))
    params = loss_mod.init(k_init, example)
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)
    cstate = coll.init(key)
    logger = CSVLogger(generate_exp_name("her_ddpg", cfg["env_name"]))

    @jax.jit
    def update_chunk(params, opt_state, rb_state, k):
        def step(carry, kk):
            params, opt_state = carry
            k_s, k_l = jax.random.split(kk)
            _, mb, _ = rb.sample_fn(rb_state, k_s, cfg["batch_size"])
            grads = jax.grad(lambda p: loss_mod(p, mb, k_l)[0])(params)
            u, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, u)
            params = params.set("target_qvalue", updater(
                params["target_qvalue"], params["qvalue"]))
            params = params.set("target_actor", updater(
                params["target_actor"], params["actor"]))
            return (params, opt_state), None

        (params, opt_state), _ = jax.lax.scan(
            step, (params, opt_state), jax.random.split(k, cfg["utd"]))
        return params, opt_state

    for it in range(cfg["iters"]):
        key, k_c, k_u = jax.random.split(key, 3)
        cstate, batch = coll.collect(params, cstate)  # [T, E, ...]
        # per-env trajectories → HER relabel + write (time-first [T, ...])
        for e in range(cfg["num_envs"]):
            rb.extend_trajectory(jax.tree.map(lambda x: x[:, e], batch))
        params, opt_state = update_chunk(params, opt_state, rb._state, k_u)
        if it % 20 == 0:
            succ = float(
                (jnp.asarray(batch["next", "reward"]) > -0.5).mean())
            logger.log_scalar("train/success_frac", succ, step=it)
            print(f"iter {it}: success_frac={succ:.3f} rb={len(rb)}")
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
