"""GAIL on Pendulum: PPO policy + discriminator-shaped reward
(counterpart of ``/root/reference/sota-implementations/gail/gail.py``).

Expert transitions come from the scripted swing-up expert (no dataset
downloads in this image).  Each iteration: collect on-policy batch →
discriminator update (expert vs policy) → relabel the batch reward with
``−log(1 − D)`` → PPO update on the surrogate reward.  Run::

    python sota/gail_pendulum.py [iters=300]
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.collectors import Collector
from rl_tpu.config import apply_overrides
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import MLP, TDModule
from rl_tpu.objectives import ClipPPOLoss, GAILLoss
from rl_tpu.objectives.value import GAE
from rl_tpu.record import CSVLogger, generate_exp_name

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import collect_dataset, expert_policy, gaussian_actor, value_module

DEFAULTS = dict(
    num_envs=16, steps_per_iter=64, iters=300, expert_frames=20_000,
    lr=3e-4, d_lr=3e-4, gamma=0.99, lmbda=0.95, clip_epsilon=0.2,
    entropy_coeff=1e-3, ppo_epochs=4, gp=True, seed=0,
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = BatchedEnv(PendulumEnv(), cfg["num_envs"])
    expert = collect_dataset(env, cfg["expert_frames"], cfg["seed"],
                             expert_policy(env))

    actor = gaussian_actor(1, low=-2.0, high=2.0)
    critic = value_module()
    disc = TDModule(MLP(out_features=1, num_cells=(128, 128),
                        activation="relu"),
                    ["observation", "action"], ["d_logits"])
    ppo_loss = ClipPPOLoss(actor, critic, clip_epsilon=cfg["clip_epsilon"],
                           entropy_coeff=cfg["entropy_coeff"])
    gail_loss = GAILLoss(disc, use_grad_penalty=cfg["gp"])
    gae = GAE(cfg["gamma"], cfg["lmbda"], critic, average_gae=True)

    coll = Collector(env, lambda p, td, k: actor(p["actor"], td, key=k),
                     frames_per_batch=cfg["steps_per_iter"] * cfg["num_envs"])

    k_init, key = jax.random.split(key)
    _, td0 = env.reset(k_init)
    example = jax.tree.map(lambda x: jnp.asarray(x)[:1], td0)
    example = example.set("action", jnp.zeros((1, 1)))
    params = ppo_loss.init(k_init, example)
    d_params = gail_loss.init(k_init, example)
    tx, d_tx = optax.adam(cfg["lr"]), optax.adam(cfg["d_lr"])
    opt_state, d_opt = tx.init(params), d_tx.init(d_params)
    cstate = coll.init(key)
    logger = CSVLogger(generate_exp_name("gail", "pendulum"))

    n_exp = jnp.asarray(expert["observation"]).shape[0]

    @jax.jit
    def train_step(params, d_params, opt_state, d_opt, cstate, k):
        k_d, k_idx, k_ppo = jax.random.split(k, 3)
        cstate, batch = coll._collect(params, cstate)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batch)
        # --- discriminator step on policy vs a same-size expert minibatch
        nb = jnp.asarray(flat["observation"]).shape[0]
        idx = jax.random.randint(k_idx, (nb,), 0, n_exp)
        exp_mb = jax.tree.map(lambda x: x[idx], expert)
        d_grads = jax.grad(
            lambda p: gail_loss(p, flat, exp_mb, k_d)[0])(d_params)
        d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        # --- surrogate reward −log(1 − D), then standard PPO
        env_rew = batch["next", "reward"].mean()
        surro = gail_loss.reward(d_params, flat).reshape(
            jnp.asarray(batch["next", "reward"]).shape)
        batch = batch.set(("next", "reward"), jax.lax.stop_gradient(surro))
        batch = gae(params["critic"], batch)
        flat_b = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batch)

        def epoch(carry, k_e):
            params, opt_state = carry
            grads = jax.grad(lambda p: ppo_loss(p, flat_b)[0])(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), None

        (params, opt_state), _ = jax.lax.scan(
            epoch, (params, opt_state),
            jax.random.split(k_ppo, cfg["ppo_epochs"]))
        return (params, d_params, opt_state, d_opt, cstate,
                surro.mean(), env_rew)

    for it in range(cfg["iters"]):
        key, k = jax.random.split(key)
        (params, d_params, opt_state, d_opt, cstate, surro_r,
         env_rew) = train_step(params, d_params, opt_state, d_opt, cstate, k)
        if it % 20 == 0:
            logger.log_scalar("train/surrogate_reward", float(surro_r), step=it)
            logger.log_scalar("train/env_reward", float(env_rew), step=it)
            print(f"iter {it}: surrogate={float(surro_r):.3f} "
                  f"env_reward={float(env_rew):.3f}")
    return params, d_params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
