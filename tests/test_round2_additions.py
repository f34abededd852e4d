"""Round-2 symbol-closure tests: MARL grouping, CrossGroupCritic, trainer
hooks, StoreStorage, OpenVLA preprocessing, TensorDictRecorder, TradingEnv."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.replay import StoreStorage
from rl_tpu.data.vla import OpenVLAImagePreprocessor
from rl_tpu.envs import MarlGroupMapType, check_marl_grouping, TradingEnv
from rl_tpu.envs.transforms import TensorDictRecorder
from rl_tpu.modules import CrossCriticGroupSpec, CrossGroupCritic


class TestMarlGrouping:
    def test_all_in_one(self):
        names = ["a0", "a1", "a2"]
        gm = MarlGroupMapType.ALL_IN_ONE_GROUP.get_group_map(names)
        assert gm == {"agents": names}
        check_marl_grouping(gm, names)

    def test_one_per_agent(self):
        names = ["a0", "a1"]
        gm = MarlGroupMapType.ONE_GROUP_PER_AGENT.get_group_map(names)
        assert gm == {"a0": ["a0"], "a1": ["a1"]}
        check_marl_grouping(gm, names)

    @pytest.mark.parametrize("bad,agents", [
        ({}, ["a"]),                                  # empty map
        ({"g": []}, ["a"]),                           # empty group
        ({"g": ["x"]}, ["a"]),                        # unknown agent
        ({"g": ["a"], "h": ["a"]}, ["a"]),            # duplicate
        ({"g": ["a"]}, ["a", "b"]),                   # missing agent
    ])
    def test_invalid(self, bad, agents):
        with pytest.raises(ValueError):
            check_marl_grouping(bad, agents)


class TestCrossGroupCritic:
    def _make(self, **kw):
        gm = {
            "soldiers": CrossCriticGroupSpec(
                obs_dim=12, n_agents=3,
                obs_key=("soldiers", "observation"),
                value_key=("soldiers", "state_value")),
            "medics": CrossCriticGroupSpec(
                obs_dim=8, n_agents=2,
                obs_key=("medics", "observation"),
                value_key=("medics", "state_value")),
        }
        return CrossGroupCritic(gm, **kw)

    def _td(self, b=4):
        return TDict({
            "soldiers": {"observation": jnp.ones((b, 3, 12))},
            "medics": {"observation": jnp.ones((b, 2, 8))},
        })

    def test_shapes(self, key):
        c = self._make()
        td = self._td()
        p = c.init(key, td)
        out = c(p, td)
        assert out["soldiers", "state_value"].shape == (4, 3, 1)
        assert out["medics", "state_value"].shape == (4, 2, 1)

    def test_detach_blocks_grads(self, key):
        c = self._make(detach_groups=["medics"])
        td = self._td()
        p = c.init(key, td)

        def f(obs):
            out = c(p, td.set(("medics", "observation"), obs))
            return jnp.sum(out["soldiers", "state_value"])

        g = jax.grad(f)(jnp.ones((4, 2, 8)))
        assert float(jnp.abs(g).sum()) == 0.0

    def test_cross_group_information_flows(self, key):
        c = self._make()
        td = self._td()
        p = c.init(key, td)
        v1 = c(p, td)["soldiers", "state_value"]
        td2 = td.set(("medics", "observation"), 5.0 * jnp.ones((4, 2, 8)))
        v2 = c(p, td2)["soldiers", "state_value"]
        assert not jnp.allclose(v1, v2)

    def test_share_params_head(self, key):
        c = self._make(share_params=True)
        td = self._td()
        p = c.init(key, td)
        out = c(p, td)
        assert out["medics", "state_value"].shape == (4, 2, 1)


class TestTrainerHooks:
    def _trainer(self):
        import optax
        from rl_tpu.trainers import Trainer
        from rl_tpu.objectives.common import LossModule

        class L(LossModule):
            def init(self, key, td):
                return TDict(w=jnp.zeros((3,)))

            def loss(self, params, td, key=None):
                return TDict(
                    loss_a=jnp.sum(params["w"] ** 2),
                    loss_b=jnp.sum((params["w"] - 1.0) ** 2),
                )

        class Coll:
            frames_per_batch = 8

            def init(self, key):
                return None

            def collect(self, params, state):
                return None, TDict(observation=jnp.ones((8, 3)))

        lm = L()
        params = lm.init(None, None)
        return Trainer(collector=Coll(), loss_module=lm,
                       optimizer=optax.sgd(0.1), params=params,
                       total_frames=16)

    def test_optimizer_hook_trains_subset(self):
        from rl_tpu.trainers import OptimizerHook
        import optax

        tr = self._trainer()
        # primary optimizer trains loss_a+loss_b; hook trains only loss_b
        hook = OptimizerHook(optax.sgd(0.1), loss_components=["loss_b"])
        tr.register_module(hook)
        tr.train()
        assert hook.opt_state is not None

    def test_utdr_and_lr_hooks(self):
        from rl_tpu.trainers import UTDRHook, LRSchedulerHook, ClearDeviceCache

        class Rec:
            def __init__(self):
                self.scalars = {}

            def log_scalar(self, name, value, step=None):
                self.scalars[name] = value

        tr = self._trainer()
        tr.logger = Rec()
        utd = UTDRHook()
        tr.register_module(utd)
        lr = LRSchedulerHook(schedule=lambda s: 0.1 / (1 + s))
        tr.register_module(lr)
        tr.register_module(ClearDeviceCache(interval=1))
        tr.train()
        assert "train/utd_ratio" in tr.logger.scalars
        assert tr.logger.scalars["train/utd_ratio"] > 0
        assert "train/learning_rate" in tr.logger.scalars

    def test_optimization_stepper(self, key):
        import optax
        from rl_tpu.trainers import OptimizationStepper
        from rl_tpu.objectives.common import LossModule

        class L(LossModule):
            def loss(self, params, td, key=None):
                return TDict(loss_a=jnp.sum(params["w"] ** 2))

        stepper = OptimizationStepper(L(), optax.sgd(0.1),
                                      clip_grad_norm=1.0)
        params = TDict(w=jnp.full((3,), 10.0))
        opt_state = stepper.init(params)
        p2, opt_state, metrics = stepper(params, opt_state,
                                         TDict(), key)
        assert float(jnp.sum(p2["w"] ** 2)) < float(jnp.sum(params["w"] ** 2))
        # clipped: update norm <= lr * clip
        delta = jnp.linalg.norm(p2["w"] - params["w"])
        assert float(delta) <= 0.1 + 1e-5
        assert "grad_norm" in metrics.keys(include_nested=True,
                                           leaves_only=True)


class TestStoreStorage:
    def test_set_get_roundtrip(self):
        s = StoreStorage(100)
        s.init()
        td = TDict(obs=np.arange(12, dtype=np.float32).reshape(3, 4),
                   nested={"a": np.ones((3, 2))})
        s.set(None, np.arange(3), [td[i] for i in range(3)])
        assert s.size() == 3
        out = s.get(None, np.array([0, 2]))
        assert np.allclose(np.asarray(out["obs"][1]), td["obs"][2])
        assert np.asarray(out["nested", "a"]).shape == (2, 2)

    def test_overwrite_keeps_size(self):
        s = StoreStorage(10)
        s.init()
        td = TDict(x=np.ones((1, 2)))
        s.set(None, np.array([0]), [td[0]])
        s.set(None, np.array([0]), [td[0]])
        assert s.size() == 1

    def test_missing_raises(self):
        s = StoreStorage(10)
        s.init()
        with pytest.raises(IndexError):
            s.get(None, np.array([5]))

    def test_batched_get_stacks(self):
        s = StoreStorage(16)
        s.init()
        data = TDict(x=np.arange(8, dtype=np.float32).reshape(4, 2))
        s.set(None, np.arange(4), [data[i] for i in range(4)])
        out = s.get(None, np.array([0, 1, 2]))
        assert np.asarray(out["x"]).shape == (3, 2)
        np.testing.assert_array_equal(np.asarray(out["x"]),
                                      data["x"][:3])


class TestOpenVLAPreprocessor:
    def test_uint8_resize(self):
        p = OpenVLAImagePreprocessor(size=16)
        out = p(np.full((2, 32, 24, 3), 128, np.uint8))
        assert out.shape == (2, 16, 16, 3)
        assert out.dtype == jnp.float32
        assert float(out.max()) <= 1.0

    def test_float01_passthrough_scale(self):
        p = OpenVLAImagePreprocessor(size=8)
        out = p(np.full((1, 8, 8, 3), 0.5, np.float32))
        assert abs(float(out.mean()) - 0.5) < 1e-5

    def test_center_crop_zooms(self):
        # an image with a bright centre: cropping increases mean brightness
        img = np.zeros((1, 33, 33, 1), np.float32)
        img[:, 10:23, 10:23] = 1.0
        plain = OpenVLAImagePreprocessor(size=33)(img)
        cropped = OpenVLAImagePreprocessor(size=33, center_crop=True)(img)
        assert float(cropped.mean()) > float(plain.mean())

    def test_multi_norm_concat(self):
        p = OpenVLAImagePreprocessor(
            size=8, mean=[[0.5] * 3, [0.0] * 3], std=[[0.5] * 3, [1.0] * 3])
        out = p(np.full((1, 8, 8, 3), 0.5, np.float32))
        assert out.shape[-1] == 6
        assert abs(float(out[..., :3].mean())) < 1e-5
        assert abs(float(out[..., 3:].mean()) - 0.5) < 1e-5

    def test_jittable(self):
        p = OpenVLAImagePreprocessor(size=8)
        out = jax.jit(p)(jnp.zeros((1, 16, 16, 3), jnp.uint8))
        assert out.shape == (1, 8, 8, 3)


class TestTensorDictRecorder:
    def test_capture_and_dump(self, tmp_path):
        rec = TensorDictRecorder(str(tmp_path / "run"), skip=2,
                                 skip_reset=False, in_keys=["obs"])
        for i in range(6):
            rec.capture(TDict(obs=np.full((2,), i, np.float32),
                              junk=np.zeros(3)))
        path = rec.dump()
        assert path is not None
        z = np.load(path)
        assert "obs" in z.files and "junk" not in z.files
        assert z["obs"].shape == (3, 2)  # every 2nd of 6
        assert rec.td == []  # cleared

    def test_empty_dump(self, tmp_path):
        rec = TensorDictRecorder(str(tmp_path / "run"))
        assert rec.dump() is None


class TestTradingEnvAlias:
    def test_alias_and_rollout(self, key):
        env = TradingEnv()
        from rl_tpu.envs import FinancialRegimeEnv, check_env_specs
        assert TradingEnv is FinancialRegimeEnv
        check_env_specs(env, key)
