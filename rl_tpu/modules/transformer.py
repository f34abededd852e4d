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

__all__ = ["CausalTransformer", "TransformerLM", "DecisionTransformer",
           "init_lm_cache", "lm_generate_cached"]


class _Block(nn.Module):
    n_heads: int
    d_model: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    decode: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model, dtype=self.dtype,
            deterministic=deterministic, dropout_rate=self.dropout,
            decode=self.decode,
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
    decode: bool = False  # KV-cached single-token decode (serving path)

    @nn.compact
    def __call__(self, x, deterministic=True, attention_mask=None,
                 pos_offset=0):
        T = x.shape[-2]
        x = nn.Dense(self.d_model, dtype=self.dtype)(x)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (self.max_len, self.d_model)
        )
        # dynamic_slice so decode mode can address position t with a traced
        # offset; equals pos[:T] when pos_offset == 0
        x = x + jax.lax.dynamic_slice_in_dim(pos, pos_offset, T, 0)
        causal = jnp.tril(jnp.ones((T, T), bool))
        mask = causal[None, None]
        if attention_mask is not None:
            pad = jnp.asarray(attention_mask, bool)[..., None, None, :]
            mask = mask & pad
        if self.decode:
            # flax's cached attention constrains to the cache index itself;
            # a T=1 causal mask would wrongly mask the cached prefix
            mask = None
        for _ in range(self.n_layers):
            x = _Block(self.n_heads, self.d_model, self.dropout, self.dtype,
                       self.decode)(x, mask, deterministic)
        return nn.LayerNorm(dtype=self.dtype)(x)


class TransformerLM(nn.Module):
    """Token-level causal LM head: tokens [.., T] -> logits [.., T, V]."""

    vocab_size: int
    n_layers: int = 2
    n_heads: int = 4
    d_model: int = 128
    max_len: int = 512
    dtype: Any = jnp.float32
    decode: bool = False

    @nn.compact
    def __call__(self, tokens, attention_mask=None, deterministic=True,
                 pos_offset=0):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)(
            jnp.asarray(tokens, jnp.int32)
        )
        h = CausalTransformer(
            n_layers=self.n_layers, n_heads=self.n_heads, d_model=self.d_model,
            max_len=self.max_len, dtype=self.dtype, decode=self.decode,
        )(x, deterministic=deterministic, attention_mask=attention_mask,
          pos_offset=pos_offset)
        return nn.Dense(self.vocab_size, dtype=self.dtype)(h)


def init_lm_cache(lm: "TransformerLM", batch_size: int, key=None):
    """Zeroed KV cache for a ``decode=True`` TransformerLM — the serving
    path's per-sequence state (the vLLM KV-cache role; reference LLM
    engines own this inside vLLM, modules/llm/backends/vllm/).  Sized by
    ``lm.max_len``; params from a ``decode=False`` twin are interchangeable
    (identical module tree)."""
    key = jax.random.PRNGKey(0) if key is None else key
    shapes = lm.init(key, jnp.zeros((batch_size, lm.max_len), jnp.int32))
    return shapes["cache"]


def lm_generate_cached(lm: "TransformerLM", params, prompts, gen_len: int,
                       key, *, temperature: float = 1.0, pad_id: int = 0,
                       cache=None):
    """Autoregressive sampling with a KV cache: one single-token forward
    per position instead of a full-sequence forward per generated token —
    O(L) vs O(L^2) attention work for the decode phase.

    ``lm`` must be constructed with ``decode=True``.  Returns
    ``(response_tokens [B, gen_len], log_probs [B, gen_len])``; greedy when
    ``temperature == 0``.

    .. warning:: the cached-attention path has NO padding mask: in
       ``decode=True`` mode any caller-supplied ``attention_mask`` is
       discarded (flax's cache constrains attention to the cache index, and
       a T=1 causal mask would wrongly mask the cached prefix), so PADDED
       variable-length prompts would attend to their pad tokens — the same
       silent generate/rescore-mismatch class CLAUDE.md documents for HF
       ``generate``.  Prompts must be UNPADDED fixed-length rows (every
       caller in-repo satisfies this); left-pad support requires threading
       a prompt mask into the cached attention (ADVICE r4, deliberate
       deviation until a caller needs ragged prompts).
    """
    B, P = prompts.shape
    total = P + gen_len
    if total > lm.max_len:
        raise ValueError(f"P+gen_len={total} exceeds max_len={lm.max_len}")
    if cache is None:
        cache = init_lm_cache(lm, B)
    tokens = jnp.concatenate(
        [jnp.asarray(prompts, jnp.int32),
         jnp.full((B, gen_len), pad_id, jnp.int32)], 1)
    lps = jnp.zeros((B, gen_len), jnp.float32)

    def body(t, carry):
        tokens, lps, cache, key = carry
        tok = jax.lax.dynamic_slice_in_dim(tokens, t, 1, 1)
        logits, mut = lm.apply(
            {"params": params, "cache": cache}, tok, pos_offset=t,
            mutable=["cache"])
        cache = mut["cache"]
        logits = jnp.asarray(logits[:, -1], jnp.float32)
        key, kk = jax.random.split(key)
        if temperature == 0.0:
            nxt = jnp.argmax(logits, -1)
            lp = jax.nn.log_softmax(logits, -1)
        else:
            nxt = jax.random.categorical(kk, logits / temperature, -1)
            lp = jax.nn.log_softmax(logits / temperature, -1)
        tok_lp = jnp.take_along_axis(lp, nxt[:, None], 1)[:, 0]
        # prompt positions: advance the cache but keep the given token
        in_response = t + 1 >= P
        cur = jax.lax.dynamic_slice_in_dim(tokens, t + 1, 1, 1)[:, 0]
        nxt = jnp.where(in_response, nxt, cur)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], t + 1, 1)
        lps = jax.lax.cond(
            in_response,
            lambda l: jax.lax.dynamic_update_slice_in_dim(
                l, tok_lp[:, None], t + 1 - P, 1),
            lambda l: l, lps)
        return tokens, lps, cache, key

    tokens, lps, cache, _ = jax.lax.fori_loop(
        0, total - 1, body, (tokens, lps, cache, key))
    return tokens[:, P:], lps


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
