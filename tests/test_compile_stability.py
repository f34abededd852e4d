"""Recompile-count guards (VERDICT r2 weak #7).

The reference asserts compile stability in ``test/compile/``; here every
hot jitted entry point must trace EXACTLY ONCE across repeated calls —
the repo's history contains a real replay retracing bug this class of
test would have caught.  ``jax.jit(f)._cache_size()`` counts traced
specializations.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.collectors import Collector
from rl_tpu.data import TDict
from rl_tpu.data.replay import PrioritizedReplayBuffer, ReplayBuffer
from rl_tpu.envs import BatchedEnv, CartPoleEnv, PendulumEnv
from rl_tpu.modules import MLP, QValueActor
from rl_tpu.trainers import DQNTrainer
from rl_tpu.data import Categorical as CategoricalSpec


def make_items(n, offset=0):
    return TDict(obs=jnp.arange(offset, offset + n, dtype=jnp.float32)[:, None],
                 act=jnp.zeros((n,), jnp.int32))


class TestReplayCompileStability:
    def test_extend_sample_trace_once(self):
        rb = ReplayBuffer(capacity=128, batch_size=16)
        for i in range(5):
            rb.extend(make_items(32, offset=32 * i))
            rb.sample()
        assert rb._jit_extend._cache_size() == 1
        assert rb._jit_sample._cache_size() == 1

    def test_prioritized_full_cycle_trace_once(self):
        rb = PrioritizedReplayBuffer(capacity=128, batch_size=16)
        for i in range(4):
            rb.extend(make_items(32, offset=32 * i))
            _, info = rb.sample(return_info=True)
            rb.update_priority(info["index"], jnp.ones(16) * (i + 1))
        assert rb._jit_extend._cache_size() == 1
        assert rb._jit_sample._cache_size() == 1
        assert rb._jit_update_priority._cache_size() == 1


class TestCollectorCompileStability:
    def test_collect_trace_once(self):
        env = BatchedEnv(CartPoleEnv(), 4)
        coll = Collector(env, None, frames_per_batch=32)
        cstate = coll.init(jax.random.PRNGKey(0))
        for _ in range(4):
            cstate, _ = coll.collect(None, cstate)
        assert coll._jit_collect._cache_size() == 1


class TestTrainerCompileStability:
    def test_dqn_update_trace_once(self):
        env = BatchedEnv(CartPoleEnv(), 4)
        qactor = QValueActor(MLP(out_features=2, num_cells=(16,)),
                             in_keys=["observation"])
        t = DQNTrainer(env, qactor, action_spec=CategoricalSpec(2),
                       frames_per_batch=32, total_frames=32 * 8,
                       batch_size=32, buffer_capacity=256, utd=1)
        update = t._make_update()
        key = jax.random.PRNGKey(0)
        cstate = t.collector.init(key)
        cstate, b0 = t.collector.collect(t._policy_state(t.params), cstate)
        from rl_tpu.trainers.algos import _flatten_time

        rb_state = t.rb.init_from_batch(_flatten_time(b0))
        aux = t._init_aux()
        params, opt = t.params, t.opt_state
        for i in range(5):
            params, opt, rb_state, cstate, aux, _ = update(
                params, opt, rb_state, cstate, aux, jax.random.PRNGKey(i))
        assert update._cache_size() == 1
