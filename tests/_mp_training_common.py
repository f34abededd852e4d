"""Shared cross-process TRAINING program (VERDICT r3 missing #2).

The SAME function runs in two settings:

* single process, 8 local virtual CPU devices (the reference result);
* two processes × 4 devices forming one global 8-device mesh via
  ``jax.distributed`` (workers in ``_mp_training_worker.py``).

It is a miniature IMPALA: sharded collection under STALE behaviour params
(pushed every ``weight_sync_interval`` learner steps), V-trace correction
with the current actor, and a jitted A2C update whose gradients all-reduce
over the ``dp`` mesh axis — in the two-process setting that psum crosses
the process boundary, which is exactly what reference
``test/test_distributed.py:487+`` update scenarios exercise.

Determinism: all PRNG keys derive from ``seed``; envs are pure-JAX, so the
two settings run the bit-identical program modulo the collective
implementation (XLA intra-process vs gloo inter-process all-reduce).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_tpu.collectors.distributed import DistributedCollector
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, CartPoleEnv
from rl_tpu.modules import MLP, Categorical, ProbabilisticActor, TDModule, ValueOperator
from rl_tpu.objectives import A2CLoss, VTrace
from rl_tpu.parallel import make_mesh, replicated
from rl_tpu.weight_update import DeviceWeightSyncScheme


def run_training(n_iters: int = 6, seed: int = 3,
                 weight_sync_interval: int = 2):
    """Returns (params, per-iter loss list) after ``n_iters`` updates."""
    mesh = make_mesh()  # spans ALL devices — global in the 2-process case
    env = BatchedEnv(CartPoleEnv(), 8)
    net = TDModule(MLP(out_features=2, num_cells=(32, 32)),
                   ["observation"], ["logits"])
    actor = ProbabilisticActor(net, Categorical, dist_keys=["logits"])
    critic = ValueOperator(MLP(out_features=1, num_cells=(32, 32)))
    key = jax.random.PRNGKey(seed)
    td0 = TDict(observation=jnp.zeros((1, 4)))
    params = TDict(actor=actor.init(key, td0), critic=critic.init(key, td0))
    params = jax.device_put(params, replicated(mesh))

    collector = DistributedCollector(
        env, lambda p, td, k: actor(p["actor"], td, key=k),
        frames_per_batch=64, mesh=mesh,
    )
    scheme = DeviceWeightSyncScheme(sharding=replicated(mesh))
    scheme.push(params)

    vtrace = VTrace(0.99, critic, actor=actor)
    loss_mod = A2CLoss(actor, critic, loss_critic_type="l2")
    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adam(1e-3))
    opt = tx.init(params)

    @jax.jit
    def learn(params, opt, batch, k):
        adv, target = vtrace.estimate(params["critic"], batch,
                                      params_actor=params["actor"])
        batch = batch.set("advantage", adv).set("value_target", target)
        flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
        (total, m), grads = jax.value_and_grad(
            lambda p: loss_mod(p, flat, k), has_aux=True
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, total

    cstate = collector.init(key)
    losses = []
    for it in range(n_iters):
        # collection runs under the last PUSHED (stale) weights — the
        # learned params must influence what gets collected
        cstate, batch = collector.collect(scheme.pull(), cstate)
        key, k = jax.random.split(key)
        params, opt, total = learn(params, opt, batch, k)
        losses.append(float(total))
        if (it + 1) % weight_sync_interval == 0:
            scheme.push(params)
    return params, losses


def params_digest(params) -> dict:
    """Order-stable digest for cross-process comparison."""
    import hashlib

    leaves = jax.tree.leaves(jax.tree.map(np.asarray, params))
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.ascontiguousarray(leaf).tobytes())
    return {
        "sha": h.hexdigest(),
        "sums": [float(np.asarray(x, np.float64).sum()) for x in leaves],
    }
