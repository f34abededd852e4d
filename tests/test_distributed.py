"""Multi-device tests on the 8-virtual-device CPU mesh: sharded collection,
weight sync schemes, IMPALA-style actor-learner with V-trace."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rl_tpu.collectors.distributed import DistributedCollector
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, CartPoleEnv, PendulumEnv
from rl_tpu.modules import (
    MLP,
    Categorical,
    ProbabilisticActor,
    TDModule,
    ValueOperator,
)
from rl_tpu.objectives import A2CLoss, VTrace
from rl_tpu.parallel import make_mesh, replicated
from rl_tpu.weight_update import (
    DeviceWeightSyncScheme,
    MultiProcessWeightSyncScheme,
    NoWeightSyncScheme,
    WeightStrategy,
)

pytestmark = pytest.mark.multidevice

needs_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def make_actor_critic(key, obs_dim, n_actions):
    net = TDModule(MLP(out_features=n_actions, num_cells=(32,)), ["observation"], ["logits"])
    actor = ProbabilisticActor(net, Categorical, dist_keys=["logits"])
    critic = ValueOperator(MLP(out_features=1, num_cells=(32,)))
    td0 = TDict(observation=jnp.zeros((1, obs_dim)))
    k1, k2 = jax.random.split(key)
    return actor, critic, TDict(actor=actor.init(k1, td0), critic=critic.init(k2, td0))


@needs_8
class TestDistributedCollector:
    def test_batch_is_sharded(self, key):
        mesh = make_mesh({"dp": 8})
        env = BatchedEnv(CartPoleEnv(), 16)
        actor, critic, params = make_actor_critic(key, 4, 2)
        col = DistributedCollector(
            env, lambda p, td, k: actor(p["actor"], td, key=k),
            frames_per_batch=64, mesh=mesh,
        )
        params_r = col.place_params(params)
        cstate = col.init(key)
        cstate, batch = col.collect(params_r, cstate)
        obs = batch["next", "observation"]
        assert obs.shape == (4, 16, 4)
        # the env axis must actually be partitioned over 8 devices
        shard_devices = {s.device for s in obs.addressable_shards}
        assert len(shard_devices) == 8

    def test_mismatched_batch_raises(self, key):
        mesh = make_mesh({"dp": 8})
        env = BatchedEnv(CartPoleEnv(), 12)  # not divisible by 8
        actor, critic, params = make_actor_critic(key, 4, 2)
        with pytest.raises(ValueError):
            DistributedCollector(env, lambda p, td, k: td, frames_per_batch=48,
                                 mesh=mesh)

    def test_counting_correct_across_shards(self, key):
        from rl_tpu.envs.testing import CountingEnv, CountingEnvCountPolicy

        mesh = make_mesh({"dp": 8})
        env = BatchedEnv(CountingEnv(max_steps=3), 8)
        col = DistributedCollector(
            env, lambda p, td, k: CountingEnvCountPolicy(td),
            frames_per_batch=48, mesh=mesh,
        )
        cstate = col.init(key)
        _, batch = col.collect(TDict(), cstate)
        obs = np.asarray(batch["next", "observation"])
        for b in range(8):
            np.testing.assert_array_equal(obs[:, b, 0], [1, 2, 3, 1, 2, 3])


@needs_8
class TestIMPALA:
    def test_actor_learner_with_stale_policy(self, key):
        """IMPALA shape: collection uses (stale) behaviour params; the
        learner corrects with V-trace. One full cycle on the mesh."""
        mesh = make_mesh({"dp": 8})
        env = BatchedEnv(CartPoleEnv(), 16)
        actor, critic, params = make_actor_critic(key, 4, 2)
        col = DistributedCollector(
            env, lambda p, td, k: actor(p["actor"], td, key=k),
            frames_per_batch=128, mesh=mesh,
        )
        scheme = DeviceWeightSyncScheme(sharding=replicated(mesh))
        scheme.push(params)
        behaviour = scheme.pull()

        vtrace = VTrace(0.99, critic, actor=actor)
        loss_mod = A2CLoss(actor, critic)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def learn(params, opt, batch, key):
            # target policy = CURRENT actor params (collection used stale
            # behaviour params) — passing params_actor is what turns the
            # importance correction on
            adv, target = vtrace.estimate(params["critic"], batch,
                                          params_actor=params["actor"])
            batch = batch.set("advantage", adv).set("value_target", target)
            flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
            (total, m), grads = jax.value_and_grad(
                lambda p: loss_mod(p, flat, key), has_aux=True
            )(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, total

        cstate = col.init(key)
        cstate, batch = col.collect(behaviour, cstate)
        # learner takes several steps -> params drift from behaviour
        for i in range(3):
            key, k = jax.random.split(key)
            params, opt, total = learn(params, opt, batch, k)
        assert np.isfinite(float(total))
        # behaviour is now stale; next batch collected with updated weights
        scheme.push(params)
        cstate, batch2 = col.collect(scheme.pull(), cstate)
        assert batch2["action"].shape == (8, 16)
        assert scheme.version == 2


class TestWeightSchemes:
    def test_no_sync(self, key):
        s = NoWeightSyncScheme()
        s.push(TDict(w=jnp.ones(3)))
        assert s.pull() is None

    def test_device_scheme_versioning(self, key):
        s = DeviceWeightSyncScheme()
        p = TDict(w=jnp.ones(3))
        s.push(p)
        out = s.pull()
        np.testing.assert_array_equal(np.asarray(out["w"]), [1, 1, 1])
        assert s.version == 1

    def test_mp_scheme_flat_roundtrip(self, key):
        s = MultiProcessWeightSyncScheme(strategy=WeightStrategy("flat"))
        template = TDict(a=jnp.zeros((2, 3)), b=jnp.zeros((4,)))
        src = TDict(a=jnp.arange(6.0).reshape(2, 3), b=jnp.full((4,), 7.0))
        s.push(src)
        out = s.pull(template)
        np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(src["a"]))
        np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(src["b"]))

    def test_mp_scheme_latest_wins(self):
        s = MultiProcessWeightSyncScheme(strategy=WeightStrategy("flat"))
        t = TDict(w=jnp.zeros(2))
        s.push(TDict(w=jnp.ones(2)))
        s.push(TDict(w=jnp.full((2,), 2.0)))
        out = s.pull(t)
        np.testing.assert_array_equal(np.asarray(out["w"]), [2, 2])
