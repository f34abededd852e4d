"""Fused reset-aware GRU sequence kernel (Pallas TPU).

TPU counterpart of the reference Triton recurrent kernels
(``/root/reference/torchrl/modules/tensordict_module/_rnn_triton.py`` — 6
@triton.jit kernels with per-step ``is_init`` reset masking inside the scan,
hidden-size padding, fwd+bwd).  Design:

* the input projection ``x @ W_i + b_i`` is done OUTSIDE the kernel as one
  big ``[T·B, D] @ [D, 3H]`` matmul (maximal MXU utilization — time steps
  batch together);
* the sequential part runs as a Pallas kernel with ``grid=(T,)``: TPU grid
  steps execute in order, so the hidden state lives in a VMEM scratch that
  persists across grid iterations — one kernel launch for the whole
  sequence, gates fused on the VPU, the ``h @ W_h`` recurrence on the MXU;
* per-step reset masking (``is_init``) is a ``where`` on the carried state —
  identical semantics to the reference kernels;
* backward runs through the ``lax.scan`` reference implementation via
  ``jax.custom_vjp`` (recompute; bitwise-matched math), so training works
  everywhere while the forward hot path is fused.

Falls back to interpreter mode off-TPU so tests run on CPU.

Measured on 1x v5e with value-synced timing (block_until_ready does not
fence on this container's tunneled backend): the GRU kernel is ~1.2x over
the XLA scan at large T*B (T=256, B=1024, H=128) and roughly at parity
below that; the LSTM kernel currently trails the XLA scan (0.7-0.8x) —
XLA's fused scan is already near the HBM bound for the 4-gate cell, so
``backend="scan"`` (the module default) is the right choice for LSTM and
for small GRU shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gru_sequence", "gru_sequence_reference", "flax_gru_params_to_fused",
           "lstm_sequence", "lstm_sequence_reference",
           "flax_lstm_params_to_fused"]


def flax_gru_params_to_fused(params) -> dict:
    """Convert flax ``nn.GRUCell`` params to the fused layout.

    Returns dict with ``w_i`` [D, 3H], ``b_i`` [3H], ``w_h`` [H, 3H],
    ``b_hn`` [H] using gate order (r, z, n).
    """
    if hasattr(params, "to_dict"):
        params = params.to_dict()
    w_i = jnp.concatenate(
        [params["ir"]["kernel"], params["iz"]["kernel"], params["in"]["kernel"]], axis=1
    )
    b_i = jnp.concatenate(
        [params["ir"]["bias"], params["iz"]["bias"], params["in"]["bias"]]
    )
    w_h = jnp.concatenate(
        [params["hr"]["kernel"], params["hz"]["kernel"], params["hn"]["kernel"]], axis=1
    )
    b_hn = params["hn"]["bias"]
    return {"w_i": w_i, "b_i": b_i, "w_h": w_h, "b_hn": b_hn}


def _gru_step(h, xp_t, init_t, w_h, b_hn):
    """One fused GRU step on pre-projected inputs (flax GRUCell math:
    ``new_h = (1 - z) * n + z * h``)."""
    H = h.shape[-1]
    mask = init_t.reshape(init_t.shape[0], *([1] * (h.ndim - 1)))
    h = jnp.where(mask, jnp.zeros_like(h), h)
    hh = jnp.dot(h, w_h, preferred_element_type=jnp.float32)
    r = jax.nn.sigmoid(xp_t[:, :H] + hh[:, :H])
    z = jax.nn.sigmoid(xp_t[:, H : 2 * H] + hh[:, H : 2 * H])
    n = jnp.tanh(xp_t[:, 2 * H :] + r * (hh[:, 2 * H :] + b_hn))
    return (1.0 - z) * n + z * h


def gru_sequence_reference(xproj, is_init, h0, w_h, b_hn):
    """lax.scan reference implementation (also the VJP path)."""

    def body(h, xs):
        xp_t, init_t = xs
        h = _gru_step(h, xp_t, init_t, w_h, b_hn)
        return h, h

    _, hs = jax.lax.scan(body, h0, (xproj, is_init))
    return hs


def _gru_kernel(xp_ref, init_ref, h0_ref, w_h_ref, b_hn_ref, out_ref, h_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h = h_scratch[:]
    init_t = init_ref[0]  # [B, 1]
    h = jnp.where(init_t > 0, jnp.zeros_like(h), h)
    xp_t = xp_ref[0]  # [B, 3H]
    H = h.shape[-1]
    hh = jnp.dot(h, w_h_ref[:], preferred_element_type=jnp.float32)
    r = jax.nn.sigmoid(xp_t[:, :H] + hh[:, :H])
    z = jax.nn.sigmoid(xp_t[:, H : 2 * H] + hh[:, H : 2 * H])
    n = jnp.tanh(xp_t[:, 2 * H :] + r * (hh[:, 2 * H :] + b_hn_ref[:]))
    new_h = (1.0 - z) * n + z * h
    h_scratch[:] = new_h
    out_ref[0] = new_h


def _gru_pallas_forward(xproj, is_init, h0, w_h, b_hn):
    T, B, H3 = xproj.shape
    H = H3 // 3
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _gru_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H3 // 3,), lambda t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(
        xproj.astype(jnp.float32),
        is_init.astype(jnp.float32),
        h0.astype(jnp.float32),
        w_h.astype(jnp.float32),
        b_hn.astype(jnp.float32),
    )


@jax.custom_vjp
def _gru_fused(xproj, is_init, h0, w_h, b_hn):
    return _gru_pallas_forward(xproj, is_init, h0, w_h, b_hn)


def _gru_fused_fwd(xproj, is_init, h0, w_h, b_hn):
    out = _gru_pallas_forward(xproj, is_init, h0, w_h, b_hn)
    return out, (xproj, is_init, h0, w_h, b_hn)


def _gru_fused_bwd(res, g):
    xproj, is_init, h0, w_h, b_hn = res
    # differentiate through the (mathematically identical) scan reference
    _, vjp = jax.vjp(
        lambda xp, h0_, wh, bh: gru_sequence_reference(xp, is_init, h0_, wh, bh),
        xproj, h0, w_h, b_hn,
    )
    d_xp, d_h0, d_wh, d_bh = vjp(g)
    return d_xp, None, d_h0, d_wh, d_bh


_gru_fused.defvjp(_gru_fused_fwd, _gru_fused_bwd)


def gru_sequence(x, is_init, h0, fused_params, *, use_pallas: bool = True):
    """Full fused GRU over a [T, B, D] sequence with reset masking.

    ``fused_params``: dict from :func:`flax_gru_params_to_fused`.
    Returns hidden states [T, B, H].
    """
    w_i, b_i = fused_params["w_i"], fused_params["b_i"]
    w_h, b_hn = fused_params["w_h"], fused_params["b_hn"]
    T, B, D = x.shape
    xproj = (x.reshape(T * B, D) @ w_i + b_i).reshape(T, B, -1)
    is_init = jnp.asarray(is_init, jnp.float32).reshape(T, B, 1)
    if use_pallas:
        return _gru_fused(xproj, is_init, h0, w_h, b_hn)
    return gru_sequence_reference(xproj, is_init, h0, w_h, b_hn)


# ---------------------------------------------------------------------------
# LSTM — same architecture as the GRU kernel: big [T·B, D] @ [D, 4H] input
# projection outside, sequential gate fusion + h @ W_h recurrence inside a
# grid=(T,) Pallas kernel with (h, c) living in VMEM scratch.  TPU
# counterpart of the reference Triton LSTM kernels (_rnn_triton.py).
# ---------------------------------------------------------------------------


def flax_lstm_params_to_fused(params) -> dict:
    """Convert flax ``nn.OptimizedLSTMCell`` params to the fused layout.

    Returns ``w_i`` [D, 4H], ``w_h`` [H, 4H], ``b_h`` [4H] with gate order
    (i, f, g, o); the input side of OptimizedLSTMCell has no bias.
    """
    if hasattr(params, "to_dict"):
        params = params.to_dict()
    order = ("i", "f", "g", "o")
    w_i = jnp.concatenate([params[f"i{g}"]["kernel"] for g in order], axis=1)
    w_h = jnp.concatenate([params[f"h{g}"]["kernel"] for g in order], axis=1)
    b_h = jnp.concatenate([params[f"h{g}"]["bias"] for g in order])
    return {"w_i": w_i, "w_h": w_h, "b_h": b_h}


def _lstm_gates(h, c, xp_t, w_h, b_h):
    H = h.shape[-1]
    hh = jnp.dot(h, w_h, preferred_element_type=jnp.float32) + b_h
    z = xp_t + hh
    i = jax.nn.sigmoid(z[:, :H])
    f = jax.nn.sigmoid(z[:, H:2 * H])
    g = jnp.tanh(z[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H:])
    new_c = f * c + i * g
    new_h = o * jnp.tanh(new_c)
    return new_h, new_c


def lstm_sequence_reference(xproj, is_init, h0, c0, w_h, b_h):
    """lax.scan reference implementation (also the VJP path)."""

    def body(carry, xs):
        h, c = carry
        xp_t, init_t = xs
        mask = init_t.reshape(init_t.shape[0], *([1] * (h.ndim - 1)))
        h = jnp.where(mask > 0, jnp.zeros_like(h), h)
        c = jnp.where(mask > 0, jnp.zeros_like(c), c)
        h, c = _lstm_gates(h, c, xp_t, w_h, b_h)
        return (h, c), (h, c)

    _, (hs, cs) = jax.lax.scan(body, (h0, c0), (xproj, is_init))
    return hs, cs


def _lstm_kernel(xp_ref, init_ref, h0_ref, c0_ref, w_h_ref, b_h_ref,
                 out_h_ref, out_c_ref, h_scratch, c_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    h = h_scratch[:]
    c = c_scratch[:]
    init_t = init_ref[0]  # [B, 1]
    h = jnp.where(init_t > 0, jnp.zeros_like(h), h)
    c = jnp.where(init_t > 0, jnp.zeros_like(c), c)
    new_h, new_c = _lstm_gates(h, c, xp_ref[0], w_h_ref[:], b_h_ref[:])
    h_scratch[:] = new_h
    c_scratch[:] = new_c
    out_h_ref[0] = new_h
    out_c_ref[0] = new_c


def _lstm_pallas_forward(xproj, is_init, h0, c0, w_h, b_h):
    T, B, H4 = xproj.shape
    H = H4 // 4
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _lstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H4,), lambda t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(
        xproj.astype(jnp.float32),
        is_init.astype(jnp.float32),
        h0.astype(jnp.float32),
        c0.astype(jnp.float32),
        w_h.astype(jnp.float32),
        b_h.astype(jnp.float32),
    )


@jax.custom_vjp
def _lstm_fused(xproj, is_init, h0, c0, w_h, b_h):
    return _lstm_pallas_forward(xproj, is_init, h0, c0, w_h, b_h)


def _lstm_fused_fwd(xproj, is_init, h0, c0, w_h, b_h):
    out = _lstm_pallas_forward(xproj, is_init, h0, c0, w_h, b_h)
    return out, (xproj, is_init, h0, c0, w_h, b_h)


def _lstm_fused_bwd(res, g):
    xproj, is_init, h0, c0, w_h, b_h = res
    _, vjp = jax.vjp(
        lambda xp, h0_, c0_, wh, bh: lstm_sequence_reference(
            xp, is_init, h0_, c0_, wh, bh),
        xproj, h0, c0, w_h, b_h,
    )
    d_xp, d_h0, d_c0, d_wh, d_bh = vjp(g)
    return d_xp, None, d_h0, d_c0, d_wh, d_bh


_lstm_fused.defvjp(_lstm_fused_fwd, _lstm_fused_bwd)


def lstm_sequence(x, is_init, h0, c0, fused_params, *,
                  use_pallas: bool = True):
    """Full fused LSTM over a [T, B, D] sequence with reset masking.

    ``fused_params``: dict from :func:`flax_lstm_params_to_fused`.
    Returns ``(hidden [T, B, H], cell [T, B, H])``.
    """
    w_i = fused_params["w_i"]
    w_h, b_h = fused_params["w_h"], fused_params["b_h"]
    T, B, D = x.shape
    xproj = (x.reshape(T * B, D) @ w_i).reshape(T, B, -1)
    is_init = jnp.asarray(is_init, jnp.float32).reshape(T, B, 1)
    if use_pallas:
        return _lstm_fused(xproj, is_init, h0, c0, w_h, b_h)
    return lstm_sequence_reference(xproj, is_init, h0, c0, w_h, b_h)
