"""Extra transform zoo tests — exact arithmetic on counting envs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, TransformedEnv, check_env_specs
from rl_tpu.envs.testing import CountingEnv, CountingEnvCountPolicy
from rl_tpu.envs.transforms import (
    Compose,
    ExpandAs,
    FiniteTensorDictCheck,
    LineariseRewards,
    NextObservationDelta,
    RandomCropTensorDict,
    Reward2GoTransform,
    SuccessReward,
    TargetReturn,
    TimeMaxPool,
    TrajCounter,
)


def roll(env, steps, key, policy=CountingEnvCountPolicy):
    _, ys, _ = env.rollout(steps, policy, key=key)
    return ys


class TestTargetReturn:
    def test_reduce_mode(self, key):
        env = TransformedEnv(CountingEnv(max_steps=10), TargetReturn(10.0))
        ys = roll(env, 4, key)
        tr = np.asarray(ys["next", "target_return"]).squeeze(-1)
        # rewards 1,2,3,4 -> remaining 9,7,4,0
        np.testing.assert_allclose(tr, [9, 7, 4, 0])

    def test_constant_mode(self, key):
        env = TransformedEnv(CountingEnv(max_steps=10),
                             TargetReturn(5.0, mode="constant"))
        ys = roll(env, 3, key)
        np.testing.assert_allclose(
            np.asarray(ys["next", "target_return"]).squeeze(-1), 5.0
        )

    def test_resets_with_episode(self, key):
        env = TransformedEnv(CountingEnv(max_steps=2), TargetReturn(10.0))
        ys = roll(env, 4, key)
        tr = np.asarray(ys["next", "target_return"]).squeeze(-1)
        np.testing.assert_allclose(tr, [9, 7, 9, 7])


class TestTimeMaxPool:
    def test_pool_over_window(self, key):
        env = TransformedEnv(CountingEnv(max_steps=3), TimeMaxPool(T=2))
        ys = roll(env, 6, key)
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        # counts 1,2,3 | reset | 1,2,3; max over last 2 (reset refills buffer)
        np.testing.assert_allclose(obs, [1, 2, 3, 1, 2, 3])


class TestTrajCounter:
    def test_increments_per_episode(self, key):
        env = TransformedEnv(CountingEnv(max_steps=2), TrajCounter())
        ys = roll(env, 6, key)
        tc = np.asarray(ys["next", "traj_count"]).squeeze(-1)
        np.testing.assert_array_equal(tc, [0, 0, 1, 1, 2, 2])


class TestReward2Go:
    def test_rb_side(self, key):
        env = CountingEnv(max_steps=3)
        _, ys, _ = env.rollout(6, CountingEnvCountPolicy, key=key)
        out = Reward2GoTransform(gamma=1.0)(ys)
        r2g = np.asarray(out["reward_to_go"]).squeeze(-1)
        np.testing.assert_allclose(r2g, [6, 5, 3, 6, 5, 3])


class TestMisc:
    def test_finite_check_counts_and_clamps(self, key):
        t = FiniteTensorDictCheck()
        bad = TDict(
            observation=jnp.array([1.0, jnp.nan, jnp.inf]),
            done=jnp.zeros((1,), bool),
        )
        _, out = t.step(TDict(), bad)
        assert int(out["nonfinite_count"]) == 2
        assert np.isfinite(np.asarray(out["observation"])).all()

    def test_expand_as(self, key):
        t = ExpandAs(in_keys=["small"], like_key="big")
        td = TDict(small=jnp.ones((1,)), big=jnp.zeros((4,)))
        _, out = t.step(TDict(), td)
        assert out["small"].shape == (4,)

    def test_success_reward(self, key):
        env = TransformedEnv(CountingEnv(max_steps=5), SuccessReward(threshold=6.0))
        ys = roll(env, 5, key)
        s = np.asarray(ys["next", "success"]).squeeze(-1)
        # cumsum 1,3,6,10,15 -> success from step 3
        np.testing.assert_array_equal(s, [0, 0, 1, 1, 1])

    def test_linearise_rewards(self):
        t = LineariseRewards(weights=[1.0, 0.5])
        td = TDict(reward=jnp.array([2.0, 4.0]), done=jnp.zeros((1,), bool))
        _, out = t.step(TDict(), td)
        np.testing.assert_allclose(np.asarray(out["reward"]), [4.0])

    def test_next_obs_delta(self, key):
        env = TransformedEnv(CountingEnv(max_steps=10), NextObservationDelta())
        ys = roll(env, 4, key)
        d = np.asarray(ys["next", "observation_delta"]).squeeze(-1)
        np.testing.assert_allclose(d, [1, 1, 1, 1])

    def test_random_crop(self, key):
        env = CountingEnv(max_steps=10)
        _, ys, _ = env.rollout(8, CountingEnvCountPolicy, key=key)
        crop = RandomCropTensorDict(sub_seq_len=3)
        out = crop(ys)
        obs = np.asarray(out["next", "observation"]).squeeze(-1)
        assert len(obs) == 3
        assert (np.diff(obs) == 1).all()  # contiguous window

    def test_spec_contract_stack(self, key):
        env = TransformedEnv(
            BatchedEnv(CountingEnv(max_steps=3), 2),
            Compose(TargetReturn(5.0), TrajCounter(), SuccessReward(2.0)),
        )
        check_env_specs(env, key)
