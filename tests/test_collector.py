"""Collector tests: batch layout, traj ids, frame accounting, determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.collectors import Collector, split_trajectories
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.envs.testing import CountingEnv, CountingEnvCountPolicy


def count_policy(params, td, key):
    return CountingEnvCountPolicy(td)


class TestCollector:
    def test_batch_layout(self, key):
        env = BatchedEnv(CountingEnv(max_steps=5), 4)
        col = Collector(env, count_policy, frames_per_batch=32)
        cstate = col.init(key)
        cstate, batch = col.collect(TDict(), cstate)
        assert batch["next", "observation"].shape == (8, 4, 1)
        assert batch["action"].shape == (8, 4)
        assert ("collector", "traj_ids") in batch

    def test_counting_exact(self, key):
        env = BatchedEnv(CountingEnv(max_steps=3), 2)
        col = Collector(env, count_policy, frames_per_batch=12)
        cstate = col.init(key)
        cstate, batch = col.collect(TDict(), cstate)
        obs = np.asarray(batch["next", "observation"])
        for b in range(2):
            np.testing.assert_array_equal(obs[:, b, 0], [1, 2, 3, 1, 2, 3])

    def test_state_carries_across_batches(self, key):
        env = BatchedEnv(CountingEnv(max_steps=5), 2)
        col = Collector(env, count_policy, frames_per_batch=4)
        cstate = col.init(key)
        cstate, b1 = col.collect(TDict(), cstate)
        cstate, b2 = col.collect(TDict(), cstate)
        obs1 = np.asarray(b1["next", "observation"])[:, 0, 0]
        obs2 = np.asarray(b2["next", "observation"])[:, 0, 0]
        np.testing.assert_array_equal(obs1, [1, 2])
        np.testing.assert_array_equal(obs2, [3, 4])  # continues, no reset

    def test_traj_ids_increment_on_done(self, key):
        env = BatchedEnv(CountingEnv(max_steps=2), 2)
        col = Collector(env, count_policy, frames_per_batch=12)
        cstate = col.init(key)
        _, batch = col.collect(TDict(), cstate)
        ids = np.asarray(batch["collector", "traj_ids"])
        # each env: id stays constant within an episode, changes after done
        assert ids.shape == (6, 2)
        for b in range(2):
            col_ids = ids[:, b]
            # episodes of length 2: ids change every 2 steps
            assert col_ids[0] == col_ids[1]
            assert col_ids[1] != col_ids[2]
        # all ids globally unique across envs
        ep0 = set(ids[:, 0].tolist())
        ep1 = set(ids[:, 1].tolist())
        assert not ep0 & ep1

    def test_frames_counted(self, key):
        env = BatchedEnv(CountingEnv(), 4)
        col = Collector(env, count_policy, frames_per_batch=16)
        cstate = col.init(key)
        cstate, _ = col.collect(TDict(), cstate)
        assert int(cstate["frames"]) == 16

    def test_iterator_total_frames(self, key):
        env = BatchedEnv(CountingEnv(), 2)
        col = Collector(env, count_policy, frames_per_batch=8, total_frames=24)
        col.update_policy_weights_(TDict())
        batches = list(col.iterator(key=key))
        assert len(batches) == 3

    def test_random_policy_fallback(self, key):
        env = BatchedEnv(PendulumEnv(), 2)
        col = Collector(env, None, frames_per_batch=10)
        cstate = col.init(key)
        _, batch = col.collect(None, cstate)
        assert batch["action"].shape == (5, 2, 1)

    def test_init_random_frames(self, key):
        env = BatchedEnv(PendulumEnv(), 2)

        def zero_policy(params, td, key):
            return td.set("action", jnp.zeros((2, 1)))

        col = Collector(env, zero_policy, frames_per_batch=10, init_random_frames=100)
        cstate = col.init(key)
        _, batch = col.collect(TDict(), cstate)
        # all frames still in random phase -> actions mostly nonzero
        assert float(jnp.abs(batch["action"]).sum()) > 0

    def test_determinism(self, key):
        env = BatchedEnv(PendulumEnv(), 2)
        col = Collector(env, None, frames_per_batch=10)
        _, b1 = col.collect(None, col.init(key))
        _, b2 = col.collect(None, col.init(key))
        np.testing.assert_array_equal(
            np.asarray(b1["next", "observation"]), np.asarray(b2["next", "observation"])
        )

    def test_unbatched_env(self, key):
        col = Collector(CountingEnv(max_steps=3), count_policy, frames_per_batch=6)
        cstate = col.init(key)
        _, batch = col.collect(TDict(), cstate)
        assert batch["next", "observation"].shape == (6, 1)

    def test_frames_per_batch_mismatch_raises(self):
        env = BatchedEnv(CountingEnv(), 3)
        with pytest.raises(ValueError):
            Collector(env, count_policy, frames_per_batch=10)


class TestSplitTrajectories:
    def test_split(self, key):
        env = BatchedEnv(CountingEnv(max_steps=3), 2)
        col = Collector(env, count_policy, frames_per_batch=12)
        _, batch = col.collect(TDict(), col.init(key))
        out = split_trajectories(batch)
        # 6 steps per env / 3-step episodes = 2 episodes per env = 4 total
        assert out["mask"].shape == (4, 3)
        assert np.asarray(out["mask"]).all()
        obs = np.asarray(out["next", "observation"]).squeeze(-1)
        for i in range(4):
            np.testing.assert_array_equal(obs[i], [1, 2, 3])


class TestBackgroundCollection:
    def test_start_fills_buffer_and_stops(self, key):
        import time

        from rl_tpu.data.replay import ReplayBuffer

        env = BatchedEnv(CountingEnv(max_steps=5), 4)
        col = Collector(env, count_policy, frames_per_batch=16, total_frames=64)
        rb = ReplayBuffer(capacity=1000, batch_size=8)
        col.update_policy_weights_(TDict())
        col.start(rb, key=key)
        deadline = time.time() + 30
        while col.frames_collected < 64 and time.time() < deadline:
            time.sleep(0.05)
        col.async_shutdown()
        assert col.frames_collected >= 64
        assert len(rb) == 64
        batch = rb.sample()
        assert batch["next", "observation"].shape == (8, 1)

    def test_pause_resume(self, key):
        import time

        from rl_tpu.data.replay import ReplayBuffer

        env = BatchedEnv(CountingEnv(max_steps=5), 4)
        col = Collector(env, count_policy, frames_per_batch=16)
        rb = ReplayBuffer(capacity=10000, batch_size=8)
        col.update_policy_weights_(TDict())
        col.start(rb, key=key)
        time.sleep(0.5)
        col.pause()
        time.sleep(0.2)
        frozen = col.frames_collected
        time.sleep(0.4)
        assert col.frames_collected == frozen  # no progress while paused
        col.resume()
        time.sleep(0.5)
        col.async_shutdown()
        assert col.frames_collected > frozen
