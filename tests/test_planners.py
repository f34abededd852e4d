"""Planner (CEM/MPPI), model-based env, and MCTS score tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import Bounded, Composite, TDict, Unbounded
from rl_tpu.envs import PendulumEnv, check_env_specs
from rl_tpu.envs.model_based import ModelBasedEnv
from rl_tpu.modules.mcts import exp3_score, puct_score, ucb1_tuned_score, ucb_score
from rl_tpu.modules.planners import CEMPlanner, MPPIPlanner


def make_point_env():
    """1-D point mass: action moves the state toward a target at 3.0.
    Optimal policy: max positive action. Reward = -(x - 3)²."""

    def world_model(params, state, td, key):
        x = state["x"] + jnp.clip(jnp.asarray(td["action"]).reshape(1), -1, 1) * 0.5
        state = TDict(x=x)
        return state, TDict(
            observation=x, reward=-((x - 3.0) ** 2),
            terminated=jnp.zeros((1,), bool),
        )

    def prior(params, key):
        x = jnp.zeros((1,))
        return TDict(x=x), TDict(observation=x)

    return ModelBasedEnv(
        world_model, prior,
        observation_spec=Composite(observation=Unbounded((1,))),
        action_spec=Bounded(-1.0, 1.0, (1,)),
    )


class TestModelBasedEnv:
    def test_contract(self, key):
        check_env_specs(make_point_env(), key)

    def test_rollout(self, key):
        env = make_point_env()
        _, ys, _ = env.rollout(10, key=key)
        assert ys["next", "reward"].shape == (10, 1)


class TestPlanners:
    @pytest.mark.parametrize("planner_cls,kwargs", [
        (CEMPlanner, dict(optim_steps=4, num_candidates=64, top_k=8)),
        (MPPIPlanner, dict(num_candidates=64, temperature=5.0, optim_steps=3)),
    ], ids=["cem", "mppi"])
    def test_plans_toward_target(self, key, planner_cls, kwargs):
        env = make_point_env()
        planner = planner_cls(env, planning_horizon=6, **kwargs)
        state, td = env.reset(key)
        out = planner(state, td, key)
        # from x=0 with target 3, the optimal first action is strongly positive
        assert float(out["action"][0]) > 0.4

    def test_planner_jits(self, key):
        env = make_point_env()
        planner = CEMPlanner(env, planning_horizon=4, optim_steps=2,
                             num_candidates=16, top_k=4)
        state, td = env.reset(key)
        f = jax.jit(lambda s, t, k: planner(s, t, k)["action"])
        a = f(state, td, key)
        assert a.shape == (1,)

    def test_mpc_stabilizes_pendulum(self, key):
        """MPC on the true Pendulum dynamics keeps the pole upright from a
        near-top start (stabilization fits inside a short horizon; swing-up
        does not — matching the reference's use of planners with accurate
        short-horizon models)."""
        env = PendulumEnv()
        planner = CEMPlanner(env, planning_horizon=10, optim_steps=3,
                             num_candidates=64, top_k=8)
        # start nearly upright
        th = jnp.array([0.1])
        thdot = jnp.array([0.0])
        state = TDict(th=th, thdot=thdot, t=jnp.zeros((1,), jnp.int32))
        td = TDict(
            observation=jnp.concatenate([jnp.cos(th), jnp.sin(th), thdot]),
            done=jnp.zeros((1,), bool), terminated=jnp.zeros((1,), bool),
            truncated=jnp.zeros((1,), bool),
        )

        @jax.jit
        def plan_step(state, td, k):
            k1, k2 = jax.random.split(k)
            td = planner(state, td, k1)
            return env.step_and_maybe_reset(state, td, k2)

        total_planned = 0.0
        k = key
        s, t = state, td
        for _ in range(30):
            k, kk = jax.random.split(k)
            s, full, t = plan_step(s, t, kk)
            total_planned += float(full["next", "reward"][0])
        # random policy falls off the top quickly
        _, ys, _ = env.rollout(30, key=key, state=state, td=td)
        total_random = float(np.asarray(ys["next", "reward"]).sum())
        assert total_planned > total_random + 10.0, (total_planned, total_random)
        assert total_planned > -10.0  # stayed near the top throughout


class TestMCTSScores:
    def test_puct_prefers_prior_when_unvisited(self):
        q = jnp.zeros(3)
        prior = jnp.array([0.1, 0.8, 0.1])
        visits = jnp.zeros(3)
        s = puct_score(q, prior, visits, jnp.asarray(9.0))
        assert int(jnp.argmax(s)) == 1

    def test_ucb_prefers_unvisited(self):
        s = ucb_score(jnp.array([10.0, 0.0]), jnp.array([5.0, 0.0]), jnp.asarray(5.0))
        assert int(jnp.argmax(s)) == 1  # unvisited -> inf

    def test_ucb_exploits_with_equal_visits(self):
        s = ucb_score(jnp.array([1.0, 0.2]), jnp.array([5.0, 5.0]), jnp.asarray(10.0))
        assert int(jnp.argmax(s)) == 0

    def test_ucb1_tuned_finite_for_visited(self):
        s = ucb1_tuned_score(jnp.array([0.5]), jnp.array([0.3]), jnp.array([4.0]),
                             jnp.asarray(8.0))
        assert np.isfinite(float(s[0]))

    def test_exp3_probabilities(self):
        p = exp3_score(jnp.array([1.0, 5.0, 0.0]), None, gamma=0.2)
        np.testing.assert_allclose(float(p.sum()), 1.0, rtol=1e-5)
        assert int(jnp.argmax(p)) == 1
