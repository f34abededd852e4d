"""Recurrent modules with in-sequence reset masking.

Counterpart of the reference recurrent stack
(``/root/reference/torchrl/modules/tensordict_module/rnn.py``: ``LSTMModule``
:650, ``GRUModule`` :2090, ``set_recurrent_mode`` :3004) and its fused Triton
kernels (``_rnn_triton.py`` — per-step ``is_init`` reset handling inside the
scan, §2.1 of SURVEY.md).  The TPU equivalent is a ``lax.scan`` whose carry
is reset by a ``where`` on the ``is_init`` flag — XLA fuses the gates; a
Pallas kernel slot is reserved in rl_tpu.ops for further fusion.

Two modes (reference semantics):

* **step mode** (collection): one cell step per call; recurrent state reads
  and writes under ``("recurrent_state", ...)``; pairs with the
  ``TensorDictPrimer`` transform via :meth:`make_primer` so the env carries
  the state.
* **sequence mode** (training): input is time-first ``[T, B?, ...]``; the
  whole sequence is scanned with per-step reset masking from ``is_init``.
"""
from __future__ import annotations

import contextlib
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict, Unbounded

__all__ = ["GRUModule", "LSTMModule", "set_recurrent_mode", "recurrent_mode"]

_RECURRENT_MODE = [False]  # False = step mode, True = sequence mode


@contextlib.contextmanager
def set_recurrent_mode(mode: bool = True):
    """Reference rnn.py:3004."""
    _RECURRENT_MODE.append(bool(mode))
    try:
        yield
    finally:
        _RECURRENT_MODE.pop()


def recurrent_mode() -> bool:
    return _RECURRENT_MODE[-1]


class _RNNModuleBase:
    cell_cls: Any = None
    state_names: tuple[str, ...] = ()

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        *,
        in_key: str = "observation",
        out_key: str = "embed",
        recurrent_key: str = "recurrent_state",
        is_init_key: str = "is_init",
        backend: str = "scan",
    ):
        self.input_size = int(input_size)
        self.hidden_size = int(hidden_size)
        self.in_key = in_key
        self.out_key = out_key
        self.recurrent_key = recurrent_key
        self.is_init_key = is_init_key
        self.backend = backend  # "scan" | "pallas" (sequence mode only)
        self.cell = self.cell_cls(features=self.hidden_size)
        self.in_keys = [in_key, is_init_key] + [
            (recurrent_key, n) for n in self.state_names
        ]
        self.out_keys = [out_key] + [
            ("next", recurrent_key, n) for n in self.state_names
        ]

    # -- carries ------------------------------------------------------------
    def _zero_carry(self, batch_shape):
        zeros = jnp.zeros(tuple(batch_shape) + (self.hidden_size,), jnp.float32)
        return self._carry_from_parts({n: zeros for n in self.state_names})

    def _carry_from_parts(self, parts: dict):
        raise NotImplementedError

    def _carry_to_parts(self, carry) -> dict:
        raise NotImplementedError

    def make_primer(self) -> "Composite":
        """Primer spec injecting the recurrent-state keys at reset (pair with
        TensorDictPrimer; reference uses the same pattern, rnn.py:650)."""
        return Composite(
            {
                (self.recurrent_key, n): Unbounded((self.hidden_size,), jnp.float32)
                for n in self.state_names
            }
        )

    def init(self, key, td: TDict):
        x = jnp.asarray(td[self.in_key])
        batch = x.shape[:-1]
        carry = self._zero_carry(batch)
        return self.cell.init(key, carry, x)["params"]

    # -- modes --------------------------------------------------------------
    def _read_carry(self, td: TDict, batch_shape):
        parts = {}
        for n in self.state_names:
            k = (self.recurrent_key, n)
            parts[n] = (
                jnp.asarray(td[k]) if k in td
                else jnp.zeros(tuple(batch_shape) + (self.hidden_size,), jnp.float32)
            )
        return self._carry_from_parts(parts)

    def _mask_carry(self, carry, is_init):
        if is_init is None:
            return carry
        m = jnp.asarray(is_init)
        if m.shape and m.shape[-1] == 1:
            m = m.squeeze(-1)

        def sel(c):
            mm = m.reshape(m.shape + (1,) * (c.ndim - m.ndim))
            return jnp.where(mm, jnp.zeros_like(c), c)

        return jax.tree.map(sel, carry)

    def step(self, params, td: TDict) -> TDict:
        """One cell step (collection mode)."""
        x = jnp.asarray(td[self.in_key])
        batch = x.shape[:-1]
        carry = self._read_carry(td, batch)
        carry = self._mask_carry(carry, td.get(self.is_init_key, None))
        carry, out = self.cell.apply({"params": params}, carry, x)
        td = td.set(self.out_key, out)
        # updated state goes under ("next", ...): the env merges it into the
        # step result and step_mdp promotes it to the following root
        for n, v in self._carry_to_parts(carry).items():
            td = td.set(("next", self.recurrent_key, n), v)
        return td

    def sequence(self, params, td: TDict) -> TDict:
        """Scan a time-first [T, B?, ...] sequence with reset masking."""
        x = jnp.asarray(td[self.in_key])
        batch = x.shape[1:-1]
        carry0 = self._zero_carry(batch)
        # allow initial state from td (non-time-dim keys)
        for n in self.state_names:
            k = (self.recurrent_key, n)
            if k in td:
                v = jnp.asarray(td[k])
                if v.ndim == x.ndim:  # [T, ..., H] — take t=0
                    v = v[0]
                parts = self._carry_to_parts(carry0)
                parts[n] = v
                carry0 = self._carry_from_parts(parts)
        is_init = td.get(self.is_init_key, None)

        if is_init is None:
            is_init = jnp.zeros(x.shape[:1] + batch + (1,), bool)

        if self.backend == "pallas" and isinstance(self, GRUModule) and len(batch) == 1:
            from rl_tpu.ops.rnn_pallas import flax_gru_params_to_fused, gru_sequence

            fused = flax_gru_params_to_fused(params)
            outs = gru_sequence(x, jnp.asarray(is_init), carry0, fused)
            carry = outs[-1]
        elif (self.backend == "pallas" and isinstance(self, LSTMModule)
              and len(batch) == 1):
            from rl_tpu.ops.rnn_pallas import (flax_lstm_params_to_fused,
                                               lstm_sequence)

            fused = flax_lstm_params_to_fused(params)
            c0, h0 = carry0  # flax LSTM carry order is (c, h)
            hs, cs = lstm_sequence(x, jnp.asarray(is_init), h0, c0, fused)
            outs = hs
            carry = (cs[-1], hs[-1])
        else:
            def body(carry, xs):
                x_t, init_t = xs
                carry = self._mask_carry(carry, init_t)
                carry, out = self.cell.apply({"params": params}, carry, x_t)
                return carry, out

            carry, outs = jax.lax.scan(body, carry0, (x, jnp.asarray(is_init)))
        td = td.set(self.out_key, outs)
        for n, v in self._carry_to_parts(carry).items():
            td = td.set(("final", self.recurrent_key, n), v)
        return td

    def __call__(self, params, td: TDict, key=None) -> TDict:
        if recurrent_mode():
            return self.sequence(params, td)
        return self.step(params, td)


class GRUModule(_RNNModuleBase):
    """Reference rnn.py:2090."""

    cell_cls = nn.GRUCell
    state_names = ("h",)

    def _carry_from_parts(self, parts):
        return parts["h"]

    def _carry_to_parts(self, carry):
        return {"h": carry}


class LSTMModule(_RNNModuleBase):
    """Reference rnn.py:650. State keys ``("recurrent_state", "h"/"c")``."""

    cell_cls = nn.OptimizedLSTMCell
    state_names = ("h", "c")

    def _carry_from_parts(self, parts):
        return (parts["c"], parts["h"])

    def _carry_to_parts(self, carry):
        c, h = carry
        return {"h": h, "c": c}
