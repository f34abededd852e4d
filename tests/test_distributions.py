"""Distribution tests: sampling domains, log-prob consistency, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.modules.distributions import (
    Categorical,
    Delta,
    IndependentNormal,
    MaskedCategorical,
    OneHotCategorical,
    Ordinal,
    TanhDelta,
    TanhNormal,
    TruncatedNormal,
)
from rl_tpu.ops import safeatanh, safetanh


class TestSafeTanh:
    def test_roundtrip(self):
        x = jnp.linspace(-5, 5, 101)
        y = safetanh(x)
        assert float(jnp.abs(y).max()) < 1.0
        x2 = safeatanh(y)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-2)

    def test_grad_finite_at_extremes(self):
        g = jax.grad(lambda x: safetanh(x).sum())(jnp.array([20.0, -20.0]))
        assert np.isfinite(np.asarray(g)).all()
        g2 = jax.grad(lambda y: safeatanh(y).sum())(jnp.array([0.9999999, -0.9999999]))
        assert np.isfinite(np.asarray(g2)).all()


class TestIndependentNormal:
    def test_log_prob_matches_analytic(self, key):
        d = IndependentNormal(jnp.zeros(3), jnp.ones(3))
        x = jnp.array([0.5, -0.5, 0.0])
        expected = float(-0.5 * (x**2).sum() - 3 * 0.5 * np.log(2 * np.pi))
        np.testing.assert_allclose(float(d.log_prob(x)), expected, rtol=1e-5)

    def test_sample_stats(self, key):
        d = IndependentNormal(jnp.full((2,), 3.0), jnp.full((2,), 0.5))
        s = d.sample(key, (20000,))
        np.testing.assert_allclose(np.asarray(s).mean(0), [3, 3], atol=0.05)
        np.testing.assert_allclose(np.asarray(s).std(0), [0.5, 0.5], atol=0.05)

    def test_entropy(self):
        d = IndependentNormal(jnp.zeros(2), jnp.ones(2))
        expected = 2 * 0.5 * (1 + np.log(2 * np.pi))
        np.testing.assert_allclose(float(d.entropy()), expected, rtol=1e-5)


class TestTanhNormal:
    def test_support(self, key):
        d = TanhNormal(jnp.zeros(2) + 3.0, jnp.ones(2) * 2.0)
        s = d.sample(key, (1000,))
        assert float(jnp.abs(s).max()) <= 1.0

    def test_custom_bounds(self, key):
        d = TanhNormal(jnp.zeros(1), jnp.ones(1), low=-2.0, high=4.0)
        s = d.sample(key, (1000,))
        assert float(s.min()) >= -2.0 and float(s.max()) <= 4.0
        # mode within bounds
        assert -2.0 <= float(d.mode[0]) <= 4.0

    def test_log_prob_integrates_to_one(self, key):
        # numeric integral of exp(log_prob) over the support ~ 1
        d = TanhNormal(jnp.zeros(1), jnp.ones(1) * 0.5)
        xs = jnp.linspace(-0.999, 0.999, 4001).reshape(-1, 1)
        lp = d.log_prob(xs)
        integral = float(jnp.trapezoid(jnp.exp(lp), xs.squeeze(-1)))
        assert abs(integral - 1.0) < 2e-2

    def test_log_prob_of_sample_finite(self, key):
        d = TanhNormal(jnp.full((4,), 2.0), jnp.full((4,), 1.5))
        s = d.sample(key, (100,))
        lp = d.log_prob(s)
        assert np.isfinite(np.asarray(lp)).all()

    def test_grad_flows(self, key):
        def loss(loc):
            d = TanhNormal(loc, jnp.ones(2))
            return d.log_prob(jnp.array([0.3, -0.2]))

        g = jax.grad(lambda l: loss(l).sum())(jnp.zeros(2))
        assert np.isfinite(np.asarray(g)).all() and (np.asarray(g) != 0).any()


class TestTruncatedNormal:
    def test_support_and_mean(self, key):
        d = TruncatedNormal(jnp.zeros(1), jnp.ones(1), low=0.0, high=1.0)
        s = d.sample(key, (5000,))
        assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
        # truncated N(0,1) to [0,1] has mean ~0.4598
        np.testing.assert_allclose(np.asarray(s).mean(), 0.4598, atol=0.02)
        np.testing.assert_allclose(float(d.mean[0]), 0.4598, atol=1e-3)

    def test_log_prob_out_of_support(self):
        d = TruncatedNormal(jnp.zeros(1), jnp.ones(1), low=-1.0, high=1.0)
        assert float(d.log_prob(jnp.array([2.0]))) == -np.inf


class TestDelta:
    def test_delta(self, key):
        d = Delta(jnp.array([1.0, 2.0]))
        np.testing.assert_array_equal(np.asarray(d.sample(key)), [1, 2])
        assert float(d.log_prob(jnp.array([1.0, 2.0]))) == 0.0
        assert float(d.log_prob(jnp.array([1.5, 2.0]))) == -np.inf

    def test_tanh_delta_bounds(self, key):
        d = TanhDelta(jnp.array([10.0]), low=-2.0, high=2.0)
        assert -2.0 <= float(d.sample(key)[0]) <= 2.0


class TestCategorical:
    def test_log_prob(self):
        logits = jnp.log(jnp.array([0.2, 0.3, 0.5]))
        d = Categorical(logits=logits)
        np.testing.assert_allclose(float(d.log_prob(jnp.array(2))), np.log(0.5), rtol=1e-5)

    def test_sample_frequencies(self, key):
        d = Categorical(probs=jnp.array([0.1, 0.9]))
        s = d.sample(key, (10000,))
        freq = float((np.asarray(s) == 1).mean())
        assert abs(freq - 0.9) < 0.02

    def test_entropy_uniform(self):
        d = Categorical(logits=jnp.zeros(4))
        np.testing.assert_allclose(float(d.entropy()), np.log(4), rtol=1e-5)

    def test_mode(self):
        d = Categorical(probs=jnp.array([0.1, 0.2, 0.7]))
        assert int(d.mode) == 2


class TestOneHotCategorical:
    def test_sample_onehot(self, key):
        d = OneHotCategorical(logits=jnp.zeros((5, 3)))
        s = d.sample(key)
        assert s.shape == (5, 3)
        assert np.asarray(s).sum(-1).tolist() == [1] * 5

    def test_log_prob_of_onehot(self):
        d = OneHotCategorical(probs=jnp.array([0.25, 0.75]))
        lp = d.log_prob(jnp.array([0, 1]))
        np.testing.assert_allclose(float(lp), np.log(0.75), rtol=1e-5)


class TestMaskedCategorical:
    def test_masked_never_sampled(self, key):
        mask = jnp.array([True, False, True])
        d = MaskedCategorical(logits=jnp.zeros(3), mask=mask)
        s = d.sample(key, (1000,))
        assert not (np.asarray(s) == 1).any()

    def test_masked_log_prob(self):
        mask = jnp.array([True, False, True])
        d = MaskedCategorical(logits=jnp.zeros(3), mask=mask)
        assert float(d.log_prob(jnp.array(1))) < -1e8
        np.testing.assert_allclose(float(d.log_prob(jnp.array(0))), np.log(0.5), atol=1e-5)


class TestOrdinal:
    def test_is_valid_distribution(self, key):
        d = Ordinal(jnp.array([0.5, -0.2, 1.0]))
        p = np.asarray(d.probs)
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
        s = d.sample(key, (100,))
        assert np.asarray(s).min() >= 0 and np.asarray(s).max() <= 2
