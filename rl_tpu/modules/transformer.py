"""Minimal causal transformer blocks (flax) — backbone for the Decision
Transformer and the LLM policy stack.

Counterpart of the reference's GPT2-config DecisionTransformer backbone
(``/root/reference/torchrl/modules/models/decision_transformer.py:19``, which
wraps HF transformers.GPT2Model).  Built natively: bf16-friendly, static
shapes, causal masking via a single lower-triangular bias — the MXU-heavy
layers (attention projections, MLP) dominate and XLA fuses the rest.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CausalTransformer", "TransformerLM", "DecisionTransformer"]


class _Block(nn.Module):
    n_heads: int
    d_model: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model, dtype=self.dtype,
            deterministic=deterministic, dropout_rate=self.dropout,
        )(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(4 * self.d_model, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return x + h


class CausalTransformer(nn.Module):
    """Stack of pre-LN causal self-attention blocks over [.., T, D] inputs."""

    n_layers: int = 3
    n_heads: int = 4
    d_model: int = 128
    max_len: int = 512
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, attention_mask=None):
        T = x.shape[-2]
        x = nn.Dense(self.d_model, dtype=self.dtype)(x)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (self.max_len, self.d_model)
        )
        x = x + pos[:T]
        causal = jnp.tril(jnp.ones((T, T), bool))
        mask = causal[None, None]
        if attention_mask is not None:
            pad = jnp.asarray(attention_mask, bool)[..., None, None, :]
            mask = mask & pad
        for _ in range(self.n_layers):
            x = _Block(self.n_heads, self.d_model, self.dropout, self.dtype)(
                x, mask, deterministic
            )
        return nn.LayerNorm(dtype=self.dtype)(x)


class TransformerLM(nn.Module):
    """Token-level causal LM head: tokens [.., T] -> logits [.., T, V]."""

    vocab_size: int
    n_layers: int = 2
    n_heads: int = 4
    d_model: int = 128
    max_len: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, attention_mask=None, deterministic=True):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)(
            jnp.asarray(tokens, jnp.int32)
        )
        h = CausalTransformer(
            n_layers=self.n_layers, n_heads=self.n_heads, d_model=self.d_model,
            max_len=self.max_len, dtype=self.dtype,
        )(x, deterministic=deterministic, attention_mask=attention_mask)
        return nn.Dense(self.vocab_size, dtype=self.dtype)(h)


class DecisionTransformer(nn.Module):
    """Return-conditioned sequence policy (Chen et al. 2021).

    Counterpart of reference decision_transformer.py:19 +
    ``DTActor``/``OnlineDTActor`` models.py:1507-1609: interleaves
    (return-to-go, state, action) token triples; the action head reads the
    state-token outputs.
    """

    state_dim: int
    action_dim: int
    n_layers: int = 3
    n_heads: int = 4
    d_model: int = 128
    max_len: int = 64  # in timesteps
    stochastic: bool = False

    @nn.compact
    def __call__(self, observation, action, return_to_go, deterministic=True):
        # inputs: [B, T, ...]
        B, T = observation.shape[0], observation.shape[1]
        s = nn.Dense(self.d_model)(observation)
        a = nn.Dense(self.d_model)(action)
        r = nn.Dense(self.d_model)(jnp.asarray(return_to_go, jnp.float32))
        # interleave (r, s, a): [B, 3T, D]
        seq = jnp.stack([r, s, a], axis=2).reshape(B, 3 * T, self.d_model)
        h = CausalTransformer(
            n_layers=self.n_layers, n_heads=self.n_heads, d_model=self.d_model,
            max_len=3 * self.max_len,
        )(seq, deterministic=deterministic)
        h = h.reshape(B, T, 3, self.d_model)[:, :, 1]  # state-token outputs
        if self.stochastic:
            out = nn.Dense(2 * self.action_dim)(h)
            loc, raw = jnp.split(out, 2, -1)
            scale = jax.nn.softplus(raw) + 1e-4
            return loc, scale
        return jnp.tanh(nn.Dense(self.action_dim)(h))
