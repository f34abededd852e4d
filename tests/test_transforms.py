"""Transform system tests — exact arithmetic on counting envs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import Composite, TDict, Unbounded
from rl_tpu.envs import (
    BatchedEnv,
    CartPoleEnv,
    PendulumEnv,
    TransformedEnv,
    check_env_specs,
)
from rl_tpu.envs.testing import CountingEnv, CountingEnvCountPolicy
from rl_tpu.envs.transforms import (
    ActionScaling,
    CatFrames,
    CatTensors,
    ClipTransform,
    Compose,
    DoubleToFloat,
    ExcludeTransform,
    FlattenObservation,
    GrayScale,
    InitTracker,
    ObservationNorm,
    RenameTransform,
    Resize,
    RewardClipping,
    RewardScaling,
    RewardSum,
    SignTransform,
    SelectTransform,
    StepCounter,
    TensorDictPrimer,
    ToTensorImage,
    UnsqueezeTransform,
    VecNorm,
)


def rollout_env(env, steps, key, policy=CountingEnvCountPolicy):
    _, ys, root = env.rollout(steps, policy, key=key)
    return ys, root


class TestStepCounter:
    def test_counts_and_resets(self, key):
        env = TransformedEnv(CountingEnv(max_steps=3), StepCounter())
        ys, _ = rollout_env(env, 7, key)
        sc = np.asarray(ys["next", "step_count"]).squeeze(-1)
        np.testing.assert_array_equal(sc, [1, 2, 3, 1, 2, 3, 1])

    def test_max_steps_truncates(self, key):
        env = TransformedEnv(CountingEnv(max_steps=100), StepCounter(max_steps=4))
        ys, _ = rollout_env(env, 9, key)
        trunc = np.asarray(ys["next", "truncated"]).squeeze(-1)
        np.testing.assert_array_equal(trunc, [0, 0, 0, 1, 0, 0, 0, 1, 0])
        sc = np.asarray(ys["next", "step_count"]).squeeze(-1)
        np.testing.assert_array_equal(sc, [1, 2, 3, 4, 1, 2, 3, 4, 1])

    def test_spec(self):
        env = TransformedEnv(CountingEnv(), StepCounter())
        assert "step_count" in env.observation_spec


class TestInitTracker:
    def test_is_init_flags(self, key):
        env = TransformedEnv(CountingEnv(max_steps=3), InitTracker())
        _, td0 = env.reset(key)
        assert bool(td0["is_init"][0])
        ys, _ = rollout_env(env, 6, key)
        # next is never an init step
        assert not np.asarray(ys["next", "is_init"]).any()
        # root after done should be init: check via root output of rollout
        # (rollout returns last root; step 3 completes an episode at t=2)


class TestRewardSum:
    def test_accumulates(self, key):
        env = TransformedEnv(CountingEnv(max_steps=3), RewardSum())
        ys, _ = rollout_env(env, 6, key)
        er = np.asarray(ys["next", "episode_reward"]).squeeze(-1)
        # rewards are 1,2,3 -> cumsum 1,3,6 then reset
        np.testing.assert_array_equal(er, [1, 3, 6, 1, 3, 6])

    def test_spec_check(self, key):
        env = TransformedEnv(CountingEnv(), RewardSum())
        check_env_specs(env, key)


class TestRewardTransforms:
    def test_scaling(self, key):
        env = TransformedEnv(CountingEnv(max_steps=10), RewardScaling(loc=1.0, scale=2.0))
        ys, _ = rollout_env(env, 3, key)
        r = np.asarray(ys["next", "reward"]).squeeze(-1)
        np.testing.assert_array_equal(r, [1 * 2 + 1, 2 * 2 + 1, 3 * 2 + 1])

    def test_clipping(self, key):
        env = TransformedEnv(CountingEnv(max_steps=10), RewardClipping(clamp_max=2.0))
        ys, _ = rollout_env(env, 4, key)
        r = np.asarray(ys["next", "reward"]).squeeze(-1)
        np.testing.assert_array_equal(r, [1, 2, 2, 2])

    def test_sign(self, key):
        env = TransformedEnv(PendulumEnv(), SignTransform())
        ys, _ = rollout_env(env, 5, key, policy=None)
        r = np.asarray(ys["next", "reward"])
        assert set(np.unique(r)).issubset({-1.0, 0.0, 1.0})


class TestObservationTransforms:
    def test_observation_norm(self, key):
        env = TransformedEnv(
            CountingEnv(max_steps=10), ObservationNorm(loc=2.0, scale=4.0)
        )
        ys, _ = rollout_env(env, 3, key)
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        np.testing.assert_allclose(obs, [(1 - 2) / 4, (2 - 2) / 4, (3 - 2) / 4])

    def test_cat_frames(self, key):
        env = TransformedEnv(CountingEnv(max_steps=10), CatFrames(N=3, axis=-1))
        _, td0 = env.reset(key)
        np.testing.assert_array_equal(np.asarray(td0["observation"]), [0, 0, 0])
        ys, _ = rollout_env(env, 4, key)
        obs = np.asarray(ys["next", "observation"])
        np.testing.assert_array_equal(obs[0], [0, 0, 1])
        np.testing.assert_array_equal(obs[1], [0, 1, 2])
        np.testing.assert_array_equal(obs[3], [2, 3, 4])

    def test_cat_frames_resets_buffer(self, key):
        env = TransformedEnv(CountingEnv(max_steps=2), CatFrames(N=2, axis=-1))
        ys, root = rollout_env(env, 2, key)
        # after done at step 2, the root buffer must be re-filled with reset obs
        np.testing.assert_array_equal(np.asarray(root["observation"]), [0, 0])

    def test_unsqueeze_flatten(self, key):
        env = TransformedEnv(
            CountingEnv(),
            Compose(UnsqueezeTransform(dim=-1), FlattenObservation(first_dim=-2)),
        )
        _, td0 = env.reset(key)
        assert td0["observation"].shape == (1,)

    def test_clip(self, key):
        env = TransformedEnv(CountingEnv(max_steps=10), ClipTransform(high=2.0))
        ys, _ = rollout_env(env, 4, key)
        assert float(np.asarray(ys["next", "observation"]).max()) == 2.0


class TestPixelTransforms:
    def make_pixel_td(self):
        return TDict(pixels=jnp.arange(2 * 8 * 8 * 3, dtype=jnp.uint8).reshape(2, 8, 8, 3))

    def test_to_tensor_image(self):
        t = ToTensorImage()
        _, out = t.step(TDict(), self.make_pixel_td())
        assert out["pixels"].dtype == jnp.float32
        assert float(out["pixels"].max()) <= 1.0

    def test_grayscale(self):
        t = GrayScale()
        _, out = t.step(TDict(), self.make_pixel_td())
        assert out["pixels"].shape == (2, 8, 8, 1)

    def test_resize(self):
        t = Resize(4, 4)
        _, out = t.step(TDict(), self.make_pixel_td())
        assert out["pixels"].shape == (2, 4, 4, 3)

    def test_pipeline_spec(self, key):
        # typical Atari pixel pipeline over a fake pixel env spec
        spec = Composite(pixels=Unbounded((84, 84, 3), jnp.uint8))
        pipeline = Compose(ToTensorImage(), GrayScale(), Resize(42))
        out = pipeline.transform_observation_spec(spec)
        assert out["pixels"].shape == (42, 42, 1)


class TestKeyTransforms:
    def test_rename(self, key):
        env = TransformedEnv(
            CountingEnv(), RenameTransform(["observation"], ["obs2"])
        )
        _, td0 = env.reset(key)
        assert "obs2" in td0 and "observation" not in td0
        assert "obs2" in env.observation_spec

    def test_exclude_select(self, key):
        env = TransformedEnv(
            CountingEnv(), Compose(StepCounter(), ExcludeTransform("step_count"))
        )
        _, td0 = env.reset(key)
        assert "step_count" not in td0

    def test_cat_tensors(self, key):
        env = TransformedEnv(
            CountingEnv(), Compose(StepCounter(), CatTensors(["observation", "step_count"]))
        )
        _, td0 = env.reset(key)
        assert td0["observation_vector"].shape == (2,)
        assert "observation" not in td0

    def test_primer(self, key):
        env = TransformedEnv(
            CountingEnv(), TensorDictPrimer({"rnn_state": Unbounded((4,))})
        )
        _, td0 = env.reset(key)
        assert td0["rnn_state"].shape == (4,)
        ys, _ = rollout_env(env, 3, key)
        assert ys["next", "rnn_state"].shape == (3, 4)


class TestActionScaling:
    def test_inverse_applied_to_env(self, key):
        env = TransformedEnv(PendulumEnv(), ActionScaling(low=-2.0, high=2.0))
        spec = env.full_action_spec["action"]
        assert float(spec.low.min()) == -1.0 and float(spec.high.max()) == 1.0
        check_env_specs(env, key)


class TestVecNorm:
    def test_normalizes_running(self, key):
        env = TransformedEnv(
            BatchedEnv(PendulumEnv(), 8), VecNorm(batch_ndim=1, decay=0.99)
        )
        _, ys, _ = env.rollout(50, key=key)
        obs = np.asarray(ys["next", "observation"])  # [T, B, 3]
        # running normalization should keep magnitudes bounded
        assert np.abs(obs[-10:]).mean() < 5.0

    def test_stats_survive_done(self, key):
        env = TransformedEnv(CountingEnv(max_steps=2), VecNorm(decay=0.5))
        k0 = key
        state, td = env.reset(k0)
        for i in range(5):
            td = CountingEnvCountPolicy(td)
            k0, k = jax.random.split(k0)
            state, full, td = env.step_and_maybe_reset(state, td, k)
        stats = state["t", "0", "observation"]
        assert float(stats["count"]) == 5.0  # not reset at episode end

    def test_frozen(self, key):
        env = TransformedEnv(CountingEnv(max_steps=5), VecNorm(frozen=True))
        _, ys, _ = env.rollout(4, CountingEnvCountPolicy, key=key)
        stats_count = 0  # frozen: stats never update -> normalize by var=1 mean=0
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        np.testing.assert_allclose(obs, [1, 2, 3, 4], atol=0.01)


class TestComposeAndJit:
    def test_full_stack_jits(self, key):
        env = TransformedEnv(
            BatchedEnv(CountingEnv(max_steps=3), 4),
            Compose(StepCounter(), InitTracker(), RewardSum(), DoubleToFloat()),
        )

        @jax.jit
        def run(k):
            return env.rollout(6, CountingEnvCountPolicy, key=k)[1]

        ys = run(key)
        er = np.asarray(ys["next", "episode_reward"])
        assert er.shape == (6, 4, 1)
        for b in range(4):
            np.testing.assert_array_equal(er[:, b, 0], [1, 3, 6, 1, 3, 6])

    def test_check_env_specs_full_stack(self, key):
        env = TransformedEnv(
            BatchedEnv(CountingEnv(max_steps=3), 4),
            Compose(StepCounter(), InitTracker(), RewardSum()),
        )
        check_env_specs(env, key)
