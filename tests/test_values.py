"""Value-estimator kernel tests: vectorized vs loop cross-checks (the
reference's core validation pattern, test/objectives/test_values.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.objectives.value import functional as F
from rl_tpu.objectives.value import GAE, TD0Estimator, TD1Estimator, TDLambdaEstimator
from rl_tpu.data import TDict


def make_traj(key, T=20, B=4, p_done=0.15):
    ks = jax.random.split(key, 6)
    reward = jax.random.normal(ks[0], (T, B, 1))
    v = jax.random.normal(ks[1], (T, B, 1))
    v_next = jax.random.normal(ks[2], (T, B, 1))
    terminated = jax.random.bernoulli(ks[3], p_done, (T, B, 1))
    truncated = jax.random.bernoulli(ks[4], 0.05, (T, B, 1)) & ~terminated
    done = terminated | truncated
    return reward, v, v_next, done, terminated


def naive_gae(gamma, lmbda, v, v_next, r, done, term):
    r, v, v_next = np.asarray(r), np.asarray(v), np.asarray(v_next)
    done, term = np.asarray(done), np.asarray(term)
    T = r.shape[0]
    adv = np.zeros_like(r)
    carry = np.zeros_like(r[0])
    for t in reversed(range(T)):
        delta = r[t] + gamma * (1 - term[t]) * v_next[t] - v[t]
        carry = delta + gamma * lmbda * (1 - done[t]) * carry
        adv[t] = carry
    return adv


class TestGAE:
    @pytest.mark.parametrize("vectorized", [True, False])
    def test_matches_naive(self, key, vectorized):
        r, v, v_next, done, term = make_traj(key)
        adv, target = F.generalized_advantage_estimate(
            0.99, 0.95, v, v_next, r, done, term, vectorized=vectorized
        )
        expected = naive_gae(0.99, 0.95, v, v_next, r, done, term)
        np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(target), expected + np.asarray(v), rtol=1e-4, atol=1e-5)

    def test_vectorized_equals_scan(self, key):
        r, v, v_next, done, term = make_traj(key, T=50, B=8)
        a1, _ = F.generalized_advantage_estimate(0.99, 0.9, v, v_next, r, done, term, vectorized=True)
        a2, _ = F.generalized_advantage_estimate(0.99, 0.9, v, v_next, r, done, term, vectorized=False)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-5)

    def test_terminal_no_bootstrap(self):
        # single step, terminated: advantage = r - v
        r = jnp.ones((1, 1))
        v = jnp.full((1, 1), 0.5)
        v_next = jnp.full((1, 1), 100.0)
        done = term = jnp.ones((1, 1), bool)
        adv, _ = F.generalized_advantage_estimate(0.99, 0.95, v, v_next, r, done, term)
        np.testing.assert_allclose(float(adv[0, 0]), 0.5, rtol=1e-5)

    def test_truncation_bootstraps(self):
        # truncated (done but not terminated): delta includes gamma*v_next
        r = jnp.ones((1, 1))
        v = jnp.zeros((1, 1))
        v_next = jnp.full((1, 1), 2.0)
        done = jnp.ones((1, 1), bool)
        term = jnp.zeros((1, 1), bool)
        adv, _ = F.generalized_advantage_estimate(0.9, 0.95, v, v_next, r, done, term)
        np.testing.assert_allclose(float(adv[0, 0]), 1 + 0.9 * 2.0, rtol=1e-5)


class TestTD:
    def test_td0(self):
        r = jnp.array([[1.0]])
        v_next = jnp.array([[2.0]])
        term = jnp.array([[False]])
        t = F.td0_return_estimate(0.9, v_next, r, term)
        np.testing.assert_allclose(float(t[0, 0]), 1 + 0.9 * 2, rtol=1e-6)

    @pytest.mark.parametrize("vectorized", [True, False])
    def test_td1_mc_when_no_done(self, key, vectorized):
        # constant reward 1, no dones, v_next=0 except bootstrap at horizon
        T = 5
        r = jnp.ones((T, 1))
        v_next = jnp.full((T, 1), 10.0)
        done = jnp.zeros((T, 1), bool)
        term = jnp.zeros((T, 1), bool)
        g = F.td1_return_estimate(0.5, v_next, r, done, term, vectorized=vectorized)
        # G_4 = 1 + .5*10 = 6; G_3 = 1 + .5*6 = 4; G_2 = 3; G_1 = 2.5; G_0 = 2.25
        np.testing.assert_allclose(np.asarray(g).squeeze(-1), [2.25, 2.5, 3, 4, 6], rtol=1e-5)

    @pytest.mark.parametrize("vectorized", [True, False])
    def test_tdlambda_limits(self, key, vectorized):
        r, v, v_next, done, term = make_traj(key)
        # λ=0 → TD0 target
        g0 = F.td_lambda_return_estimate(0.99, 0.0, v_next, r, done, term, vectorized=vectorized)
        td0 = F.td0_return_estimate(0.99, v_next, r, term)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(td0), rtol=1e-4, atol=1e-5)
        # λ=1 → TD1
        g1 = F.td_lambda_return_estimate(0.99, 1.0, v_next, r, done, term, vectorized=vectorized)
        td1 = F.td1_return_estimate(0.99, v_next, r, done, term, vectorized=vectorized)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(td1), rtol=1e-4, atol=1e-5)

    def test_gae_target_equals_tdlambda(self, key):
        """GAE value_target == TDλ return when done == terminated and the
        value sequence is continuous, i.e. v_next[t] == v[t+1]
        (the reference's cross-estimator identity)."""
        r, v, _, _, term = make_traj(key, p_done=0.2)
        done = term  # no truncations
        v_next = jnp.concatenate([v[1:], jax.random.normal(key, v[:1].shape)], axis=0)
        adv, target = F.generalized_advantage_estimate(0.99, 0.95, v, v_next, r, done, term)
        # GAE recursion uses (1-done) for the trace and (1-term) for bootstrap;
        # with done==term these coincide with TDλ's recursion
        tdlam = F.td_lambda_return_estimate(0.99, 0.95, v_next, r, done, term)
        np.testing.assert_allclose(np.asarray(target), np.asarray(tdlam), rtol=1e-3, atol=1e-4)


class TestVTrace:
    def test_on_policy_reduces_to_td(self, key):
        """With π == μ and thresholds ≥ 1, vs == TDλ(λ=1)-style targets."""
        r, v, _, done, term = make_traj(key, p_done=0.0)
        done = term = jnp.zeros_like(done)
        # continuity: v_next[t] == v[t+1] so the telescoping identity holds
        v_next = jnp.concatenate([v[1:], jax.random.normal(key, v[:1].shape)], axis=0)
        log_pi = jnp.zeros(r.shape[:-1])
        adv, vs = F.vtrace_advantage_estimate(
            0.99, log_pi, log_pi, v, v_next, r, done, term
        )
        # on-policy V-trace target: vs_t = V_t + sum_k gamma^k delta_{t+k}
        g1 = F.td1_return_estimate(0.99, v_next, r, done, term)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(g1), rtol=1e-3, atol=1e-4)

    def test_clipped_ratios_bound_updates(self, key):
        r, v, v_next, done, term = make_traj(key)
        log_mu = jnp.zeros(r.shape[:-1])
        log_pi = jnp.full(r.shape[:-1], 10.0)  # wildly off-policy
        adv, vs = F.vtrace_advantage_estimate(0.99, log_pi, log_mu, v, v_next, r, done, term)
        assert np.isfinite(np.asarray(adv)).all()
        assert np.isfinite(np.asarray(vs)).all()


class TestReward2Go:
    def test_resets_at_done(self):
        r = jnp.ones((6, 1))
        done = jnp.array([0, 0, 1, 0, 0, 1], bool).reshape(6, 1)
        r2g = F.reward2go(r, done, gamma=1.0)
        np.testing.assert_allclose(np.asarray(r2g).squeeze(-1), [3, 2, 1, 3, 2, 1])


class TestEstimatorClasses:
    def make_td_and_net(self, key, T=10, B=3):
        from rl_tpu.modules import MLP, ValueOperator

        ks = jax.random.split(key, 5)
        obs = jax.random.normal(ks[0], (T, B, 4))
        next_obs = jax.random.normal(ks[1], (T, B, 4))
        td = TDict(
            observation=obs,
            next={
                "observation": next_obs,
                "reward": jax.random.normal(ks[2], (T, B, 1)),
                "done": jax.random.bernoulli(ks[3], 0.1, (T, B, 1)),
                "terminated": jax.random.bernoulli(ks[3], 0.1, (T, B, 1)),
            },
        )
        vnet = ValueOperator(MLP(out_features=1, num_cells=(8,)))
        params = vnet.init(ks[4], td)
        return td, vnet, params

    def test_gae_writes_keys(self, key):
        td, vnet, params = self.make_td_and_net(key)
        est = GAE(0.99, 0.95, vnet)
        out = est(params, td)
        assert "advantage" in out and "value_target" in out
        assert out["advantage"].shape == (10, 3, 1)

    @pytest.mark.parametrize("cls", [TD0Estimator, TD1Estimator, TDLambdaEstimator])
    def test_estimators_run(self, key, cls):
        td, vnet, params = self.make_td_and_net(key)
        est = cls(0.99, value_network=vnet)
        out = est(params, td)
        assert np.isfinite(np.asarray(out["advantage"])).all()

    def test_jit(self, key):
        td, vnet, params = self.make_td_and_net(key)
        est = GAE(0.99, 0.95, vnet)
        out = jax.jit(est.__call__)(params, td)
        assert "advantage" in out


class TestShiftedGAE:
    def test_shifted_equals_full_when_terminated(self, key):
        """Reference `shifted` mode: with collector-written V(s_t), GAE
        derives V(s_{t+1}) by shifting + ONE critic call on the final
        next state.  Where done==terminated the bootstrap gate makes it
        EXACTLY equal to the two-pass computation."""
        import jax

        from rl_tpu.modules import MLP, TDModule, ValueOperator

        T, B, D = 12, 4, 5
        critic = ValueOperator(MLP(out_features=1, num_cells=(16,)))
        ks = jax.random.split(key, 5)
        obs = jax.random.normal(ks[0], (T, B, D))
        term = jax.random.bernoulli(ks[1], 0.2, (T, B, 1))
        # next_obs: where terminated it's a distinct terminal frame; the
        # following row's obs is the reset frame (collector convention)
        next_obs = jnp.concatenate([obs[1:], jax.random.normal(ks[2], (1, B, D))])
        next_obs = jnp.where(term, jax.random.normal(ks[3], (T, B, 1, 1))[..., 0], next_obs)
        td = TDict(
            observation=obs,
            next={
                "observation": next_obs,
                "reward": jax.random.normal(ks[4], (T, B, 1)),
                "done": term,
                "terminated": term,
            },
        )
        params = critic.init(key, TDict(observation=jnp.zeros((1, D))))
        full = GAE(0.99, 0.95, critic)
        adv_full, vt_full = full.estimate(params, td)

        # collector-written values
        v = critic(params, td)["state_value"]
        td_s = td.set("state_value", v)
        shifted = GAE(0.99, 0.95, critic, shifted=True)
        adv_s, vt_s = shifted.estimate(params, td_s)
        np.testing.assert_allclose(np.asarray(adv_s), np.asarray(adv_full),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vt_s), np.asarray(vt_full),
                                   rtol=1e-5, atol=1e-6)

    def test_shifted_falls_back_without_values(self, key):
        from rl_tpu.modules import MLP, ValueOperator

        critic = ValueOperator(MLP(out_features=1, num_cells=(8,)))
        T, B, D = 4, 2, 3
        td = TDict(
            observation=jnp.zeros((T, B, D)),
            next={"observation": jnp.zeros((T, B, D)),
                  "reward": jnp.zeros((T, B, 1)),
                  "done": jnp.zeros((T, B, 1), bool),
                  "terminated": jnp.zeros((T, B, 1), bool)},
        )
        params = critic.init(key, TDict(observation=jnp.zeros((1, D))))
        est = GAE(0.99, 0.95, critic, shifted=True)
        adv, vt = est.estimate(params, td)  # no stored values -> full path
        assert adv.shape == (T, B, 1)
