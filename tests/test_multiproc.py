"""Multiprocess collector fleet + async env pool tests.

Reference behaviors covered: torchrl/collectors/_multi_sync.py:27,
_multi_async.py:25, _runner.py:36 protocol, preemptive_threshold
_multi_base.py:231; torchrl/envs/async_envs.py:59 (env_index out-of-order),
env_creator.py (EnvCreator metadata caching).

Spawn workers re-import jax (~seconds each) — keep fleets tiny.
"""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import (
    AsyncEnvPool,
    BatchedEnv,
    EnvCreator,
    PendulumEnv,
    ProcessAsyncEnvPool,
    ThreadingAsyncEnvPool,
)
from rl_tpu.modules import MLP, Seq, TanhModule, TDModule


def make_env():
    return BatchedEnv(PendulumEnv(), 2)


def make_single():
    return PendulumEnv()


def make_actor():
    return Seq(
        TDModule(MLP(out_features=1, num_cells=(8,)), ["observation"], ["param"]),
        TanhModule(["param"], ["action"], low=-2.0, high=2.0),
    )


class TestEnvCreator:
    def test_meta_and_pickle(self):
        creator = EnvCreator(make_env)
        assert creator.batch_size == (2,)
        assert creator.action_spec is not None
        c2 = pickle.loads(pickle.dumps(creator))
        env = c2()
        assert env.batch_size == (2,)


class TestMultiSyncCollector:
    def test_collect_shapes_and_total_frames(self):
        from rl_tpu.collectors import MultiSyncCollector

        coll = MultiSyncCollector(
            [EnvCreator(make_env)] * 2,
            None,
            frames_per_batch=32,
            total_frames=64,
        )
        try:
            batches = list(coll.iterator())
            assert len(batches) == 2
            b = batches[0]
            # [T=8, B=2 workers x 2 envs]
            assert b["observation"].shape[:2] == (8, 4)
            assert b["next", "reward"].shape[:2] == (8, 4)
            ids = np.asarray(b["collector", "traj_ids"])
            assert ids.shape == (8, 4)
        finally:
            coll.shutdown()

    def test_preemptive_threshold_mask(self):
        from rl_tpu.collectors import MultiSyncCollector

        coll = MultiSyncCollector(
            [EnvCreator(make_env)] * 2,
            None,
            frames_per_batch=32,
            total_frames=32,
            preemptive_threshold=0.5,
        )
        try:
            (b,) = list(coll.iterator())
            mask = np.asarray(b["collector", "mask"])
            ids = np.asarray(b["collector", "traj_ids"])
            assert mask.shape == ids.shape
            # preempted steps (if any) are tagged traj_ids == -1
            assert np.all((ids >= 0) | ~mask[..., : ids.shape[-1]].reshape(ids.shape))
        finally:
            coll.shutdown()


class TestMultiAsyncCollector:
    def test_fcfs_batches_and_weight_update(self, key):
        from rl_tpu.collectors import MultiAsyncCollector

        actor = make_actor()
        params = actor.init(key, TDict(observation=jnp.zeros((1, 3))))
        coll = MultiAsyncCollector(
            [EnvCreator(make_env)] * 2,
            actor,
            frames_per_batch=32,
            total_frames=64,
        )
        try:
            n = 0
            for b in coll.iterator(params=params):
                assert b["observation"].shape[:2] == (8, 2)
                coll.update_policy_weights_(params)
                n += 1
            assert n == 4
        finally:
            coll.shutdown()


class TestThreadingAsyncEnvPool:
    def test_out_of_order_step(self):
        pool = ThreadingAsyncEnvPool([make_single] * 3)
        try:
            pool.async_reset_send(seed=0)
            td = pool.async_reset_recv(min_get=3)
            assert td["observation"].shape == (3, 3)
            assert sorted(np.asarray(td["env_index"]).tolist()) == [0, 1, 2]
            td = td.set("action", jnp.zeros((3, 1)))
            pool.async_step_send(td)
            part = pool.async_step_recv(min_get=2)
            k = part["observation"].shape[0]
            assert k >= 2
            assert part["next", "reward"].shape == (k, 1)
            rest = (
                pool.async_step_recv(min_get=3 - k) if k < 3 else None
            )
            got = set(np.asarray(part["env_index"]).tolist())
            if rest is not None:
                got |= set(np.asarray(rest["env_index"]).tolist())
            assert got == {0, 1, 2}
        finally:
            pool.close()

    def test_pending_guard(self):
        pool = ThreadingAsyncEnvPool([make_single] * 2)
        try:
            pool.async_reset_send(seed=0)
            with pytest.raises(RuntimeError):
                pool.async_reset_send(seed=1)
        finally:
            pool.close()

    def test_factory_dispatch(self):
        pool = AsyncEnvPool([make_single] * 2, backend="threading")
        assert isinstance(pool, ThreadingAsyncEnvPool)
        pool.close()


class TestProcessAsyncEnvPool:
    def test_roundtrip(self):
        pool = ProcessAsyncEnvPool([EnvCreator(make_single)] * 2)
        try:
            td = pool.reset(seed=0)
            assert td["observation"].shape == (2, 3)
            td = td.set("action", jnp.zeros((2, 1)))
            out = pool.step(td)
            assert out["next", "observation"].shape == (2, 3)
            assert out["next", "done"].shape == (2, 1)
        finally:
            pool.close()
