"""Host-env bridge tests (gymnasium via io_callback)."""
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("gymnasium") is None, reason="gymnasium not installed"
)

from rl_tpu.collectors import Collector  # noqa: E402
from rl_tpu.data import TDict  # noqa: E402
from rl_tpu.envs.libs import GymEnv, gym_space_to_spec  # noqa: E402


class TestSpaceConversion:
    def test_box(self):
        import gymnasium.spaces as S

        spec = gym_space_to_spec(S.Box(-1.0, 2.0, (3,)))
        assert spec.shape == (3,)
        assert float(spec.high.max()) == 2.0

    def test_discrete(self):
        import gymnasium.spaces as S

        spec = gym_space_to_spec(S.Discrete(5))
        assert spec.n == 5

    def test_dict(self):
        import gymnasium.spaces as S

        spec = gym_space_to_spec(S.Dict({"a": S.Discrete(2), "b": S.Box(0, 1, (2,))}))
        assert spec["a"].n == 2
        assert spec["b"].shape == (2,)


class TestGymEnv:
    def test_reset_step(self, key):
        env = GymEnv("CartPole-v1", num_envs=3)
        try:
            state, td = env.reset(key)
            assert td["observation"].shape == (3, 4)
            td = env.rand_action(td, key)
            state, full, root = env.step_and_maybe_reset(state, td, key)
            assert full["next", "reward"].shape == (3, 1)
            assert root["observation"].shape == (3, 4)
        finally:
            env.close()

    def test_rollout_autoresets(self, key):
        env = GymEnv("CartPole-v1", num_envs=2)
        try:
            _, ys, _ = env.rollout(120, key=key)
            dones = np.asarray(ys["next", "done"])
            assert dones.sum() > 2  # random cartpole dies in ~20 steps
            # rewards all 1.0 for cartpole
            assert (np.asarray(ys["next", "reward"]) == 1.0).all()
        finally:
            env.close()

    def test_collector_on_gym_env(self, key):
        env = GymEnv("CartPole-v1", num_envs=2)
        try:
            col = Collector(env, None, frames_per_batch=20)
            cstate = col.init(key)
            cstate, batch = col.collect(None, cstate)
            assert batch["next", "observation"].shape == (10, 2, 4)
            assert ("collector", "traj_ids") in batch
        finally:
            env.close()

    def test_continuous_env(self, key):
        env = GymEnv("Pendulum-v1", num_envs=2)
        try:
            _, ys, _ = env.rollout(10, key=key)
            assert ys["next", "observation"].shape == (10, 2, 3)
            assert float(np.asarray(ys["next", "reward"]).max()) <= 0.0
        finally:
            env.close()


@pytest.mark.slow
class TestMuJoCoBridge:
    def test_halfcheetah_rollout(self, key):
        try:
            env = GymEnv("HalfCheetah-v4", num_envs=2)
        except Exception as e:
            pytest.skip(f"mujoco unavailable: {e}")
        try:
            _, ys, _ = env.rollout(20, key=key)
            assert ys["next", "observation"].shape == (20, 2, 17)
            assert np.isfinite(np.asarray(ys["next", "reward"])).all()
        finally:
            env.close()


class TestHostAutoresetGuard:
    def test_row_stateful_transform_rejected(self, key):
        # per-row-state transforms (StepCounter & co) silently corrupt under
        # the host-autoreset bridge (reset applied to every row each step) —
        # must raise instead (ADVICE r3 #2)
        import pytest

        from rl_tpu.envs.transforms import StepCounter, TransformedEnv

        env = TransformedEnv(GymEnv("CartPole-v1", num_envs=2), StepCounter())
        try:
            state, td = env.reset(key)
            td = env.env.rand_action(td, key)
            with pytest.raises(ValueError, match="StepCounter"):
                env.step_and_maybe_reset(state, td, key)
        finally:
            env.env.close()

    def test_stateless_transform_still_works(self, key):
        from rl_tpu.envs.transforms import RewardScaling, TransformedEnv

        env = TransformedEnv(GymEnv("CartPole-v1", num_envs=2),
                             RewardScaling(scale=0.5))
        try:
            state, td = env.reset(key)
            td = env.env.rand_action(td, key)
            state, full, root = env.step_and_maybe_reset(state, td, key)
            assert float(np.asarray(full["next", "reward"]).max()) == 0.5
        finally:
            env.env.close()
