"""Async PPO on Pendulum (counterpart of
``/root/reference/sota-implementations/ppo-async/``): the collector runs
on a background thread, continuously extending a replay buffer, while the
learner samples fresh transitions, updates with the clipped objective
(TD(0) advantages — replayed data has no contiguous trajectories), and
pushes new weights to the collector after every optimization burst.  Run::

    python sota/ppo_async_pendulum.py [updates=400]
"""
import sys
import time

import jax
import jax.numpy as jnp
import optax

from rl_tpu.collectors import Collector
from rl_tpu.config import apply_overrides
from rl_tpu.data.replay import ReplayBuffer
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.objectives import ClipPPOLoss
from rl_tpu.record import CSVLogger, generate_exp_name

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import gaussian_actor, value_module

DEFAULTS = dict(
    num_envs=16, frames_per_batch=512, buffer_capacity=16_384,
    updates=400, batch_size=1024, lr=3e-4, gamma=0.99,
    clip_epsilon=0.2, entropy_coeff=1e-3, seed=0,
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = BatchedEnv(PendulumEnv(), cfg["num_envs"])
    actor = gaussian_actor(1, low=-2.0, high=2.0)
    critic = value_module()
    loss_mod = ClipPPOLoss(actor, critic, clip_epsilon=cfg["clip_epsilon"],
                           entropy_coeff=cfg["entropy_coeff"])

    k_init, key = jax.random.split(key)
    _, td0 = env.reset(k_init)
    example = jax.tree.map(lambda x: jnp.asarray(x)[:1], td0)
    example = example.set("action", jnp.zeros((1, 1)))
    params = loss_mod.init(k_init, example)
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)

    coll = Collector(env, lambda p, td, k: actor(p["actor"], td, key=k),
                     frames_per_batch=cfg["frames_per_batch"])
    rb = ReplayBuffer(capacity=cfg["buffer_capacity"])
    coll.start(rb, params=params, key=key)
    logger = CSVLogger(generate_exp_name("ppo_async", "pendulum"))

    @jax.jit
    def update(params, opt_state, mb, k):
        # TD(0) advantage on replayed transitions
        v = critic(params["critic"], mb)["state_value"]
        v_next = critic(params["critic"], mb["next"])["state_value"]
        nonterm = 1.0 - jnp.asarray(mb["next", "terminated"], jnp.float32)
        target = (jnp.asarray(mb["next", "reward"])
                  + cfg["gamma"] * nonterm * v_next)
        adv = jax.lax.stop_gradient(target - v)
        adv = (adv - adv.mean()) / (adv.std() + 1e-6)
        mb = mb.set("advantage", adv).set(
            "value_target", jax.lax.stop_gradient(target))
        (total, metrics), grads = jax.value_and_grad(
            lambda p: loss_mod(p, mb), has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    # wait for the first batches to land
    while len(rb) < cfg["batch_size"]:
        time.sleep(0.05)
    try:
        for it in range(cfg["updates"]):
            key, k_u = jax.random.split(key)
            mb = rb.sample(cfg["batch_size"])
            params, opt_state, total = update(params, opt_state, mb, k_u)
            coll.update_policy_weights_(params)
            if it % 50 == 0:
                rew = float(jnp.asarray(mb["next", "reward"]).mean())
                logger.log_scalar("train/loss", float(total), step=it)
                logger.log_scalar("train/buffer_reward", rew, step=it)
                print(f"update {it}: loss={float(total):.4f} "
                      f"buffer_reward={rew:.3f} "
                      f"collected={coll.frames_collected}")
    finally:
        coll.async_shutdown()
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
