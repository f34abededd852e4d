"""IMPALA-style actor-learner with V-trace over a device mesh.

Counterpart of ``/root/reference/sota-implementations/impala/`` (single-node
and multi-node variants): actors are shards of the global env batch on the
mesh's ``dp`` axis; the learner consumes the sharded batch; off-policy lag
from delayed weight pushes is corrected with V-trace.  Run (with 8 virtual
devices for a CPU demo)::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/impala_cartpole.py total_frames=200000
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_tpu.collectors.distributed import DistributedCollector
from rl_tpu.config import apply_overrides
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, CartPoleEnv
from rl_tpu.modules import MLP, Categorical, ProbabilisticActor, TDModule, ValueOperator
from rl_tpu.objectives import A2CLoss, VTrace
from rl_tpu.parallel import make_mesh, replicated
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.weight_update import DeviceWeightSyncScheme

DEFAULTS = dict(
    num_envs=64,
    steps_per_batch=32,
    total_frames=200_000,
    lr=1e-3,
    gamma=0.99,
    weight_sync_interval=2,  # learner steps between weight pushes (staleness)
    seed=0,
    logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    mesh = make_mesh()
    env = BatchedEnv(CartPoleEnv(), cfg["num_envs"])
    net = TDModule(MLP(out_features=2, num_cells=(64, 64)), ["observation"], ["logits"])
    actor = ProbabilisticActor(net, Categorical, dist_keys=["logits"])
    critic = ValueOperator(MLP(out_features=1, num_cells=(64, 64)))
    key = jax.random.PRNGKey(cfg["seed"])
    td0 = TDict(observation=jnp.zeros((1, 4)))
    params = TDict(actor=actor.init(key, td0), critic=critic.init(key, td0))

    collector = DistributedCollector(
        env, lambda p, td, k: actor(p["actor"], td, key=k),
        frames_per_batch=cfg["num_envs"] * cfg["steps_per_batch"], mesh=mesh,
    )
    scheme = DeviceWeightSyncScheme(sharding=replicated(mesh))
    scheme.push(params)

    vtrace = VTrace(cfg["gamma"], critic, actor=actor)
    loss_mod = A2CLoss(actor, critic, entropy_coeff=0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg["lr"]))
    opt = tx.init(params)
    logger = (
        CSVLogger(generate_exp_name("impala", "cartpole")) if cfg["logger"] == "csv" else None
    )

    @jax.jit
    def learn(params, opt, batch, k):
        batch = vtrace(params["critic"], batch)
        flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
        (total, m), grads = jax.value_and_grad(
            lambda p: loss_mod(p, flat, k), has_aux=True
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, total

    cstate = collector.init(key)
    frames, it = 0, 0
    while frames < cfg["total_frames"]:
        cstate, batch = collector.collect(scheme.pull(), cstate)
        frames += collector.frames_per_batch
        key, k = jax.random.split(key)
        params, opt, total = learn(params, opt, batch, k)
        if it % cfg["weight_sync_interval"] == 0:
            scheme.push(params)
        if logger and it % 10 == 0:
            r = float(jnp.asarray(batch["next", "reward"]).mean())
            ep_len = 1.0 / max(float(jnp.asarray(batch["next", "done"]).mean()), 1e-4)
            logger.log_scalar("train/reward", r, step=frames)
            logger.log_scalar("train/episode_length", ep_len, step=frames)
            print(f"frames {frames} loss {float(total):.4f} ep_len {ep_len:.1f}")
        it += 1
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
