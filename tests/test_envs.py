"""Env core tests: spec contracts, step/next semantics, auto-reset, batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import (
    BatchedEnv,
    CartPoleEnv,
    ContinuousMountainCarEnv,
    Env,
    MountainCarEnv,
    PendulumEnv,
    check_env_specs,
    step_mdp,
)
from rl_tpu.envs.testing import (
    ContinuousActionTestEnv,
    CountingEnv,
    CountingEnvCountPolicy,
    MultiKeyCountingEnv,
    NestedCountingEnv,
)

ALL_ENVS = [
    CountingEnv,
    NestedCountingEnv,
    MultiKeyCountingEnv,
    ContinuousActionTestEnv,
    CartPoleEnv,
    PendulumEnv,
    MountainCarEnv,
    ContinuousMountainCarEnv,
]


@pytest.mark.parametrize("env_cls", ALL_ENVS, ids=lambda c: c.__name__)
class TestEnvContract:
    def test_check_env_specs(self, env_cls, key):
        check_env_specs(env_cls(), key)

    def test_batched_check_env_specs(self, env_cls, key):
        check_env_specs(BatchedEnv(env_cls(), 4), key)

    def test_step_writes_next(self, env_cls, key):
        env = env_cls()
        k0, k1, k2 = jax.random.split(key, 3)
        state, td = env.reset(k0)
        td = env.rand_action(td, k1)
        state, td2 = env.step(state, td, k2)
        assert ("next", "reward") in td2
        assert ("next", "done") in td2
        assert ("next", "terminated") in td2
        assert ("next", "truncated") in td2
        # root untouched
        for k in ("done", "terminated", "truncated"):
            assert not bool(jnp.any(jnp.asarray(td2[k])))

    def test_rollout_shapes(self, env_cls, key):
        env = env_cls()
        _, ys, _ = env.rollout(7, key=key)
        assert ys["next", "reward"].shape[0] == 7
        assert ys["next", "done"].shape[0] == 7

    def test_rollout_jits(self, env_cls, key):
        env = env_cls()
        f = jax.jit(lambda k: env.rollout(5, key=k)[1])
        ys = f(key)
        assert ys["next", "done"].shape[0] == 5


class TestCountingSemantics:
    """Exact integer arithmetic on the counter (reference test pattern)."""

    def test_count_increments(self, key):
        env = CountingEnv(max_steps=5)
        _, ys, _ = env.rollout(10, CountingEnvCountPolicy, key=key)
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        # counts: 1..5 then auto-reset: 1..5
        np.testing.assert_array_equal(obs, [1, 2, 3, 4, 5, 1, 2, 3, 4, 5])

    def test_done_at_max(self, key):
        env = CountingEnv(max_steps=3)
        _, ys, _ = env.rollout(9, CountingEnvCountPolicy, key=key)
        done = np.asarray(ys["next", "done"]).squeeze(-1)
        np.testing.assert_array_equal(done, [0, 0, 1, 0, 0, 1, 0, 0, 1])

    def test_root_after_autoreset_is_reset_obs(self, key):
        env = CountingEnv(max_steps=2)
        k0, k1, k2 = jax.random.split(key, 3)
        state, td = env.reset(k0)
        td = CountingEnvCountPolicy(td)
        state, td_full, root = env.step_and_maybe_reset(state, td, k1)
        assert float(td_full["next", "observation"][0]) == 1.0
        assert float(root["observation"][0]) == 1.0  # no reset yet
        td = CountingEnvCountPolicy(root)
        state, td_full, root = env.step_and_maybe_reset(state, td, k2)
        assert float(td_full["next", "observation"][0]) == 2.0  # pre-reset obs kept
        assert bool(td_full["next", "done"][0])
        assert float(root["observation"][0]) == 0.0  # post-reset obs

    def test_no_action_no_increment(self, key):
        env = CountingEnv(max_steps=5)
        zero_policy = lambda td, k=None: td.set("action", jnp.zeros((), jnp.int32))
        _, ys, _ = env.rollout(4, zero_policy, key=key)
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        np.testing.assert_array_equal(obs, [0, 0, 0, 0])

    def test_batched_counting_independent(self, key):
        env = BatchedEnv(CountingEnv(max_steps=4), 3)
        _, ys, _ = env.rollout(8, CountingEnvCountPolicy, key=key)
        obs = np.asarray(ys["next", "observation"])  # [T, B, 1]
        assert obs.shape == (8, 3, 1)
        for b in range(3):
            np.testing.assert_array_equal(obs[:, b, 0], [1, 2, 3, 4, 1, 2, 3, 4])


class TestStepMdp:
    def test_promotes_next(self, key):
        env = CountingEnv()
        k0, k1, k2 = jax.random.split(key, 3)
        state, td = env.reset(k0)
        td = env.rand_action(td, k1)
        _, td2 = env.step(state, td, k2)
        root = step_mdp(td2)
        assert "reward" not in root
        assert "action" not in root
        assert "next" not in root
        np.testing.assert_array_equal(
            np.asarray(root["observation"]), np.asarray(td2["next", "observation"])
        )

    def test_keep_other(self, key):
        env = CountingEnv()
        k0, k1, k2 = jax.random.split(key, 3)
        state, td = env.reset(k0)
        td = env.rand_action(td, k1).set("extra", jnp.ones(3))
        _, td2 = env.step(state, td, k2)
        root = step_mdp(td2, keep_other=True)
        assert "extra" in root


class TestClassicDynamics:
    def test_cartpole_terminates_eventually(self, key):
        env = CartPoleEnv()
        # constant-left policy destabilizes quickly
        policy = lambda td, k=None: td.set("action", jnp.zeros((), jnp.int32))
        _, ys, _ = env.rollout(100, policy, key=key)
        assert bool(jnp.any(ys["next", "terminated"]))

    def test_pendulum_truncates_at_limit(self, key):
        env = PendulumEnv(max_episode_steps=50)
        _, ys, _ = env.rollout(50, key=key)
        trunc = np.asarray(ys["next", "truncated"]).squeeze(-1)
        assert trunc[-1]
        assert not trunc[:-1].any()
        assert not np.asarray(ys["next", "terminated"]).any()

    def test_pendulum_reward_range(self, key):
        env = PendulumEnv()
        _, ys, _ = env.rollout(30, key=key)
        r = np.asarray(ys["next", "reward"])
        assert (r <= 0).all()
        assert (r >= -17.0).all()  # analytic lower bound of the cost

    def test_mountain_car_needs_momentum(self, key):
        env = MountainCarEnv(max_episode_steps=50)
        push_right = lambda td, k=None: td.set("action", jnp.full((), 2, jnp.int32))
        _, ys, _ = env.rollout(50, push_right, key=key)
        # pushing right alone from the valley cannot reach the goal in 50 steps
        assert not bool(jnp.any(ys["next", "terminated"]))

    def test_break_when_any_done_freezes(self, key):
        env = CountingEnv(max_steps=3)
        _, ys, _ = env.rollout(
            8, CountingEnvCountPolicy, key=key, break_when_any_done=True
        )
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        np.testing.assert_array_equal(obs[:3], [1, 2, 3])
        done = np.asarray(ys["next", "done"]).squeeze(-1)
        assert done[2]
