"""Macro-action primitives, ModuleTransform, VecNormV2, VIPRewardTransform
(reference _primitive.py / module.py / vecnorm.py / vip.py:345)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, PendulumEnv, TransformedEnv
from rl_tpu.envs.minatar import BreakoutEnv
from rl_tpu.envs.transforms import (
    MacroPrimitive,
    MeanActionSelector,
    ModuleTransform,
    TargetMacroAction,
    VecNormV2,
    VIPRewardTransform,
    expand_macro,
    make_macro_env,
)
from rl_tpu.modules import MLP, TDModule


class TestExpandMacro:
    def test_move_interpolates_to_target(self):
        macro = TargetMacroAction.move(jnp.array([[1.0, -1.0]]), steps=4)
        actions, valid = expand_macro(macro, jnp.zeros((1, 2)), horizon=6)
        assert actions.shape == (1, 6, 2)
        np.testing.assert_allclose(np.asarray(actions[0, 0]), [0.25, -0.25],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(actions[0, 3]), [1.0, -1.0],
                                   atol=1e-6)
        # past `steps`, held at target; valid only through steps+settle
        np.testing.assert_allclose(np.asarray(actions[0, 5]), [1.0, -1.0],
                                   atol=1e-6)
        assert valid[0].tolist() == [True] * 4 + [False] * 2

    def test_wait_holds_start(self):
        macro = TargetMacroAction.wait(2, (1,), steps=3)
        start = jnp.array([[0.5, 0.5]])
        actions, valid = expand_macro(macro, start, horizon=4)
        np.testing.assert_allclose(np.asarray(actions),
                                   np.broadcast_to([0.5, 0.5], (1, 4, 2)))
        assert valid[0].tolist() == [True] * 3 + [False]

    def test_settle_extends_validity(self):
        macro = TargetMacroAction.move(jnp.ones((1, 1)), steps=2,
                                       settle_steps=2)
        _, valid = expand_macro(macro, jnp.zeros((1, 1)), horizon=5)
        assert valid[0].tolist() == [True] * 4 + [False]


class TestMacroEnv:
    def test_executes_macro_on_pendulum(self, key):
        env = BatchedEnv(PendulumEnv(), 4)
        menv = make_macro_env(env, horizon=6)
        state, td = menv.reset(key)
        macro = TargetMacroAction.move(jnp.zeros((4, 1)), steps=4,
                                       settle_steps=2)
        td = td.set("action", macro)
        state, full, nxt = menv.step(state, td, key)
        # reward is the sum over 6 low-level steps → more negative than 1
        r = np.asarray(full["next", "reward"])
        assert r.shape == (4, 1)
        assert (r < 0).all() and (r > -60).all()
        assert full["next", "observation"].shape == (4, 3)


class TestMeanActionSelector:
    def test_forward_and_inverse(self, key):
        env = TransformedEnv(BatchedEnv(PendulumEnv(), 3),
                             MeanActionSelector())
        state, td = env.reset(key)
        assert td["observation", "mean"].shape == (3, 3)
        assert bool(jnp.all(td["observation", "var"] == 0))
        td = td.set("action", TDict(mean=jnp.zeros((3, 1)),
                                    var=jnp.ones((3, 1))))
        state, full, nxt = env.step_and_maybe_reset(state, td, key)
        assert nxt["observation", "mean"].shape == (3, 3)


class TestModuleTransform:
    def test_runs_module_on_outputs(self, key):
        mod = TDModule(MLP(out_features=4, num_cells=(8,)),
                       ["observation"], ["features"])
        env = TransformedEnv(BatchedEnv(PendulumEnv(), 2),
                             ModuleTransform(mod, no_grad=True))
        state, td = env.reset(key)
        assert td["features"].shape == (2, 4)
        td = td.set("action", jnp.zeros((2, 1)))
        state, full, nxt = env.step_and_maybe_reset(state, td, key)
        assert nxt["features"].shape == (2, 4)


class TestVecNormV2:
    def test_stateless_uses_given_stats(self, key):
        t = VecNormV2(stateful=False, loc=jnp.array([1.0, 1.0, 1.0]),
                      scale=jnp.array([2.0, 2.0, 2.0]))
        env = TransformedEnv(BatchedEnv(PendulumEnv(), 2), t)
        state, td = env.reset(key)
        assert td["observation"].shape == (2, 3)
        assert np.isfinite(np.asarray(td["observation"])).all()

    def test_freeze_unfreeze(self):
        t = VecNormV2()
        assert not t.frozen
        t.freeze()
        assert t.frozen
        t.unfreeze()
        assert not t.frozen


class TestVIPReward:
    def test_reward_is_embedding_potential(self, key):
        t = VIPRewardTransform(in_key="pixels")
        env = TransformedEnv(BatchedEnv(BreakoutEnv(), 2), t)

        # goal_image must be present at reset: prime it via options-free
        # manual flow — reset, inject, re-run transform
        base = BatchedEnv(BreakoutEnv(), 2)
        st, td0 = base.reset(key)
        goal = td0["pixels"]

        class Primed(VIPRewardTransform):
            def reset(self, k, ts, td):
                td = td.set("goal_image", goal)
                return super().reset(k, ts, td)

        env = TransformedEnv(base, Primed(in_key="pixels"))
        state, td = env.reset(key)
        assert "goal_embedding" in td
        td = td.set("action", jnp.zeros((2,), jnp.int32))
        state, full, nxt = env.step_and_maybe_reset(state, td, key)
        r = np.asarray(full["next", "reward"])
        assert r.shape == (2, 1) and np.isfinite(r).all()
