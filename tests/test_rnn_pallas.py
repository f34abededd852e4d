"""Fused GRU kernel: parity with flax GRUCell and the scan reference."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.ops.rnn_pallas import (
    flax_gru_params_to_fused,
    gru_sequence,
    gru_sequence_reference,
)

T, B, D, H = 12, 8, 5, 16


@pytest.fixture
def setup(key):
    cell = nn.GRUCell(features=H)
    params = cell.init(key, jnp.zeros((B, H)), jnp.zeros((B, D)))["params"]
    fused = flax_gru_params_to_fused(params)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (T, B, D))
    is_init = jax.random.bernoulli(ks[1], 0.15, (T, B, 1))
    h0 = jax.random.normal(ks[2], (B, H)) * 0.1
    return cell, params, fused, x, is_init, h0


class TestFusedGRU:
    def test_matches_flax_cell(self, setup):
        cell, params, fused, x, is_init, h0 = setup
        out = gru_sequence(x, is_init, h0, fused)
        # manual flax unroll with the same reset masking
        h = h0
        outs = []
        for t in range(T):
            mask = np.asarray(is_init[t])
            h = jnp.where(jnp.asarray(mask), jnp.zeros_like(h), h)
            h, _ = cell.apply({"params": params}, h, x[t])
            outs.append(h)
        expected = jnp.stack(outs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=2e-4, atol=2e-5)

    def test_pallas_equals_scan_reference(self, setup):
        cell, params, fused, x, is_init, h0 = setup
        a = gru_sequence(x, is_init, h0, fused, use_pallas=True)
        b = gru_sequence(x, is_init, h0, fused, use_pallas=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_reset_masks_zero_state(self, setup):
        cell, params, fused, x, is_init, h0 = setup
        all_init = jnp.ones((T, B, 1), bool)
        out = gru_sequence(x, all_init, h0, fused)
        # every step starts from zero state: equals single-step outputs
        single = gru_sequence(
            x, jnp.ones((T, B, 1), bool), jnp.zeros((B, H)), fused
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(single), rtol=1e-5)

    def test_grads_flow_and_match_reference(self, setup):
        cell, params, fused, x, is_init, h0 = setup

        def loss_fused(f):
            return (gru_sequence(x, is_init, h0, f, use_pallas=True) ** 2).sum()

        def loss_ref(f):
            return (gru_sequence(x, is_init, h0, f, use_pallas=False) ** 2).sum()

        g1 = jax.grad(loss_fused)(fused)
        g2 = jax.grad(loss_ref)(fused)
        for k in fused:
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g2[k]), rtol=2e-3, atol=1e-4
            )

    def test_jit(self, setup):
        cell, params, fused, x, is_init, h0 = setup
        f = jax.jit(lambda x: gru_sequence(x, is_init, h0, fused))
        out = f(x)
        assert out.shape == (T, B, H)


class TestGRUModulePallasBackend:
    def test_backends_agree(self, key):
        from rl_tpu.data import TDict
        from rl_tpu.modules.rnn import GRUModule, set_recurrent_mode

        x = jax.random.normal(key, (10, 4, 5))
        is_init = jax.random.bernoulli(key, 0.2, (10, 4, 1))
        td = TDict(observation=x, is_init=is_init)
        m_scan = GRUModule(5, 16, backend="scan")
        m_pallas = GRUModule(5, 16, backend="pallas")
        params = m_scan.init(key, TDict(observation=x[0]))
        with set_recurrent_mode(True):
            a = m_scan(params, td)["embed"]
            b = m_pallas(params, td)["embed"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


from rl_tpu.ops.rnn_pallas import (
    flax_lstm_params_to_fused,
    lstm_sequence,
    lstm_sequence_reference,
)


@pytest.fixture
def lstm_setup(key):
    cell = nn.OptimizedLSTMCell(features=H)
    carry0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    params = cell.init(key, carry0, jnp.zeros((B, D)))["params"]
    fused = flax_lstm_params_to_fused(params)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (T, B, D))
    is_init = jax.random.bernoulli(ks[1], 0.15, (T, B, 1))
    h0 = jax.random.normal(ks[2], (B, H)) * 0.1
    c0 = jax.random.normal(ks[3], (B, H)) * 0.1
    return cell, params, fused, x, is_init, h0, c0


class TestFusedLSTM:
    def test_matches_flax_cell(self, lstm_setup):
        cell, params, fused, x, is_init, h0, c0 = lstm_setup
        hs, cs = lstm_sequence(x, is_init, h0, c0, fused)
        carry = (c0, h0)  # flax carry order (c, h)
        outs_h, outs_c = [], []
        for t in range(T):
            mask = jnp.asarray(is_init[t])
            carry = tuple(jnp.where(mask, jnp.zeros_like(v), v) for v in carry)
            carry, out = cell.apply({"params": params}, carry, x[t])
            outs_c.append(carry[0])
            outs_h.append(out)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(jnp.stack(outs_h)),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(cs), np.asarray(jnp.stack(outs_c)),
                                   rtol=2e-4, atol=2e-5)

    def test_pallas_equals_scan_reference(self, lstm_setup):
        cell, params, fused, x, is_init, h0, c0 = lstm_setup
        ha, ca = lstm_sequence(x, is_init, h0, c0, fused, use_pallas=True)
        hb, cb = lstm_sequence(x, is_init, h0, c0, fused, use_pallas=False)
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), rtol=1e-5,
                                   atol=1e-6)

    def test_grads_flow_and_match_reference(self, lstm_setup):
        cell, params, fused, x, is_init, h0, c0 = lstm_setup

        def loss(fn):
            def f(fp):
                hs, cs = fn(x, is_init, h0, c0, fp)
                return (hs**2).sum() + (cs[-1] ** 2).sum()
            return f

        g_pallas = jax.grad(loss(lambda *a: lstm_sequence(*a, use_pallas=True)))(fused)
        g_scan = jax.grad(loss(lambda *a: lstm_sequence(*a, use_pallas=False)))(fused)
        for k in fused:
            np.testing.assert_allclose(np.asarray(g_pallas[k]),
                                       np.asarray(g_scan[k]),
                                       rtol=1e-4, atol=1e-5)

    def test_module_backend_parity(self, key):
        from rl_tpu.data import TDict
        from rl_tpu.modules.rnn import LSTMModule, set_recurrent_mode

        mod_s = LSTMModule(input_size=D, hidden_size=H, backend="scan")
        mod_p = LSTMModule(input_size=D, hidden_size=H, backend="pallas")
        x = jax.random.normal(key, (T, B, D))
        is_init = jax.random.bernoulli(key, 0.2, (T, B, 1))
        td = TDict(observation=x, is_init=is_init)
        params = mod_s.init(key, TDict(observation=x[0]))
        with set_recurrent_mode(True):
            out_s = mod_s(params, td)
            out_p = mod_p(params, td)
        np.testing.assert_allclose(
            np.asarray(out_s[mod_s.out_key]), np.asarray(out_p[mod_p.out_key]),
            rtol=2e-4, atol=2e-5)
