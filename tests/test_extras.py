"""SpaceInvaders env, video recorder, offline datasets, dm_control bridge."""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.datasets import OfflineDatasetBuffer, load_d4rl_npz
from rl_tpu.envs import BatchedEnv, check_env_specs
from rl_tpu.envs.minatar import SpaceInvadersEnv
from rl_tpu.envs.transforms.recorder import VideoRecorder, record_rollout_video
from rl_tpu.record import CSVLogger


class TestSpaceInvaders:
    def test_contract(self, key):
        check_env_specs(SpaceInvadersEnv(), key)

    def test_batched_jit_rollout(self, key):
        env = BatchedEnv(SpaceInvadersEnv(), 8)
        ys = jax.jit(lambda k: env.rollout(100, key=k)[1])(key)
        assert ys["next", "pixels"].shape == (100, 8, 10, 10, 6)
        # random play eventually shoots an alien and eventually dies
        assert float(np.asarray(ys["next", "reward"]).sum()) > 0
        assert bool(np.asarray(ys["next", "terminated"]).any())

    def test_fire_cooldown(self, key):
        env = SpaceInvadersEnv()
        state, td = env.reset(key)
        fire = lambda td, k=None: td.set("action", jnp.asarray(3, jnp.int32))
        _, ys, _ = env.rollout(4, fire, key=key)
        # only one friendly bullet possible in the first SHOT_COOLDOWN steps
        fb = np.asarray(ys["next", "pixels"])[..., 1]
        assert fb[1].sum() <= 1


class TestVideoRecorder:
    def test_capture_dump(self, key, tmp_path):
        env = BatchedEnv(SpaceInvadersEnv(), 2)
        lg = CSVLogger("vid", str(tmp_path))
        _, ys, _ = env.rollout(10, key=key)
        rec = VideoRecorder(lg, tag="test/video", upscale=2)
        rec.capture(ys)
        vid = rec.dump(step=1)
        assert vid.shape == (10, 20, 20, 6) or vid.shape[0] == 10
        files = os.listdir(tmp_path / "vid" / "videos")
        assert files

    def test_one_call_render(self, key, tmp_path):
        env = BatchedEnv(SpaceInvadersEnv(), 2)
        lg = CSVLogger("vid2", str(tmp_path))
        vid = record_rollout_video(env, None, lg, key=key, max_steps=5)
        assert vid is not None and vid.shape[0] == 5


class TestOfflineDatasets:
    def make_npz(self, tmp_path, n=100):
        rng = np.random.RandomState(0)
        path = str(tmp_path / "data.npz")
        np.savez(
            path,
            observations=rng.randn(n, 4).astype(np.float32),
            actions=rng.randn(n, 2).astype(np.float32),
            rewards=rng.randn(n).astype(np.float32),
            terminals=rng.rand(n) < 0.05,
            timeouts=np.zeros(n, bool),
        )
        return path

    def test_load_d4rl(self, tmp_path):
        path = self.make_npz(tmp_path)
        td = load_d4rl_npz(path)
        assert td["observation"].shape == (100, 4)
        assert ("next", "done") in td
        # shifted next_obs: next_obs[t] == obs[t+1]
        np.testing.assert_array_equal(
            np.asarray(td["next", "observation"][0]), np.asarray(td["observation"][1])
        )

    def test_offline_buffer_feeds_loss(self, tmp_path, key):
        from rl_tpu.modules import MLP, NormalParamExtractor, ProbabilisticActor, Seq, TDModule, ValueOperator
        from rl_tpu.objectives import IQLLoss

        path = self.make_npz(tmp_path)
        rb = OfflineDatasetBuffer(path, batch_size=32)
        assert rb.num_transitions == 100
        batch = rb.sample()
        net = Seq(
            TDModule(MLP(out_features=4, num_cells=(16,)), ["observation"], ["pre"]),
            TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
        )
        from rl_tpu.modules import TanhNormal

        actor = ProbabilisticActor(net, TanhNormal)
        qvalue = TDModule(MLP(out_features=1, num_cells=(16,)),
                          ["observation", "action"], ["state_action_value"])
        value = ValueOperator(MLP(out_features=1, num_cells=(16,)))
        loss = IQLLoss(actor, qvalue, value)
        params = loss.init(key, batch)
        total, _ = loss(params, batch, key)
        assert np.isfinite(float(total))


@pytest.mark.slow
class TestDMControl:
    def test_bridge(self, key):
        if importlib.util.find_spec("dm_control") is None:
            pytest.skip("dm_control not installed")
        from rl_tpu.envs.libs.dm_control import DMControlEnv

        try:
            env = DMControlEnv("cartpole", "balance", num_envs=2)
        except Exception as e:
            pytest.skip(f"dm_control unavailable: {e}")
        try:
            _, ys, _ = env.rollout(5, key=key)
            assert ys["next", "observation"].shape[0] == 5
            assert np.isfinite(np.asarray(ys["next", "reward"])).all()
        finally:
            env.close()
