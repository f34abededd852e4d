"""SAC on HalfCheetah through the PIPELINED host collector.

The double-buffered variant of ``examples/sac_halfcheetah.py``: instead of
stepping the host envs inside the jitted collection scan (io_callback
serializes [host step] → [device policy] → …), collection runs on the host
with :class:`rl_tpu.collectors.pipelined.PipelinedHostCollector` — device
policy compute of one env group overlaps MuJoCo stepping of the other —
and the device runs the fused UTD update over the replay buffer between
batches.  On an accelerator this hides the bridge latency that dominates
the MuJoCo configs (SURVEY §7.3); on CPU (host == device) it is expected
to be ≤ the fused path.

Run::

    python examples/sac_halfcheetah_pipelined.py [total_frames=1000000]
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.collectors.pipelined import PipelinedHostCollector
from rl_tpu.config import apply_overrides
from rl_tpu.data import TDict
from rl_tpu.data.replay import ReplayBuffer
from rl_tpu.modules import (MLP, NormalParamExtractor, ProbabilisticActor,
                            Seq, TanhNormal, TDModule)
from rl_tpu.objectives import SACLoss, SoftUpdate
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(
    env_name="HalfCheetah-v4",
    num_envs=8,
    frames_per_batch=256,
    total_frames=1_000_000,
    buffer_capacity=1_000_000,
    batch_size=256,
    utd=256,
    lr=3e-4,
    gamma=0.99,
    tau=0.005,
    alpha_init=1.0,
    init_random_frames=25_000,
    seed=0,
    logger="csv",
)


def main(cfg=None):
    import gymnasium

    cfg = {**DEFAULTS, **(cfg or {})}
    probe = gymnasium.make(cfg["env_name"])
    obs_dim = probe.observation_space.shape[0]
    act_dim = probe.action_space.shape[0]
    lo = float(probe.action_space.low.min())
    hi = float(probe.action_space.high.max())
    probe.close()

    net = Seq(
        TDModule(MLP(out_features=2 * act_dim, num_cells=(256, 256),
                     activation="relu"), ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    actor = ProbabilisticActor(net, TanhNormal,
                               dist_kwargs={"low": lo, "high": hi})
    qvalue = TDModule(MLP(out_features=1, num_cells=(256, 256),
                          activation="relu"),
                      ["observation", "action"], ["state_action_value"])
    loss_mod = SACLoss(actor, qvalue, gamma=cfg["gamma"], action_dim=act_dim,
                       alpha_init=cfg["alpha_init"])
    updater = SoftUpdate(tau=cfg["tau"])

    key = jax.random.PRNGKey(cfg["seed"])
    td0 = TDict(observation=jnp.zeros((1, obs_dim)))
    params = loss_mod.init(key, td0)
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)
    rb = ReplayBuffer(capacity=cfg["buffer_capacity"],
                      batch_size=cfg["batch_size"])

    def policy(p, td, k):
        # PipelinedHostCollector jits the policy ONCE — a python branch on a
        # frame counter would be baked into the trace (ADVICE r3 #1).  The
        # frame count rides in the params pytree as a traced leaf instead,
        # selected with jnp.where.
        td = actor(p["actor"], td, key=k)
        rand = jax.random.uniform(jax.random.fold_in(k, 1),
                                  td["action"].shape, minval=lo, maxval=hi)
        use_rand = p["frames"] < cfg["init_random_frames"]
        return td.set("action", jnp.where(use_rand, rand, td["action"]))

    coll = PipelinedHostCollector(
        lambda: gymnasium.make(cfg["env_name"]), cfg["num_envs"], policy,
        frames_per_batch=cfg["frames_per_batch"])

    def update_many(params, opt_state, rb_state, key):
        def upd(carry, k):
            params, opt_state, rb_state = carry
            k_s, k_l = jax.random.split(k)
            rb_state, mb, _ = rb.sample_fn(rb_state, k_s,
                                           batch_size=cfg["batch_size"])
            grads = jax.grad(lambda p: loss_mod(p, mb, k_l)[0])(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = params.set("target_qvalue", updater(
                params["target_qvalue"], params["qvalue"]))
            return (params, opt_state, rb_state), None

        (params, opt_state, rb_state), _ = jax.lax.scan(
            upd, (params, opt_state, rb_state),
            jax.random.split(key, cfg["utd"]))
        return params, opt_state, rb_state

    update = jax.jit(update_many, donate_argnums=(0, 1, 2))
    extend = jax.jit(rb.extend_fn, donate_argnums=0)

    logger = (CSVLogger(generate_exp_name("sac_pipelined", cfg["env_name"]))
              if cfg["logger"] == "csv" else None)
    rb_state = None
    frames = 0
    it = 0
    import time

    t0 = time.perf_counter()
    while frames < cfg["total_frames"]:
        key, k_c, k_u = jax.random.split(key, 3)
        batch = coll.collect(params.set("frames", jnp.asarray(frames)), k_c)
        flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
        if rb_state is None:
            rb_state = rb.init_from_batch(flat)
        rb_state, _ = extend(rb_state, flat)
        frames += cfg["frames_per_batch"]
        params, opt_state, rb_state = update(params, opt_state, rb_state, k_u)
        if logger and it % 20 == 0:
            r = float(jnp.asarray(batch["next", "reward"]).mean())
            fps = frames / (time.perf_counter() - t0)
            logger.log_scalar("train/reward", r, step=frames)
            logger.log_scalar("train/env_steps_per_s", fps, step=frames)
            print(f"frames {frames} reward {r:.3f} {fps:,.0f} steps/s",
                  flush=True)
        it += 1
    coll.close()
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
