"""ACT: Action Chunking with Transformers (Zhao et al. 2023).

Counterpart of ``/root/reference/torchrl/modules/models/act.py`` (``ACTModel``
:14).  A CVAE over action chunks: a style encoder embeds the demonstrated
chunk into a latent ``z ~ N(mu, exp(log_var))``; a conditional decoder
predicts the chunk from (observation, z).  At inference the latent is the
prior mean (zeros) — the standard ACT recipe.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ACTModel"]


def _sinusoidal_pos_enc(length: int, dim: int):
    """(length, dim) sinusoidal table (reference act.py:218)."""
    pos = jnp.arange(length)[:, None]
    i = jnp.arange(dim // 2)[None, :]
    angle = pos / jnp.power(10000.0, 2 * i / dim)
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], -1)


class _EncoderBlock(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model
        )(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.d_model)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


class ACTModel(nn.Module):
    """CVAE action-chunk policy (reference act.py:14).

    ``__call__(observation, action_chunk=None, z_key=None)``:

    * training (``action_chunk`` given): returns
      ``(action_pred, mu, log_var)`` with ``z`` sampled via the
      reparameterization trick (``z_key`` required);
    * inference (no chunk): ``z = 0`` (prior mean), returns
      ``(action_pred, zeros, zeros)``.
    """

    action_dim: int
    chunk_size: int
    latent_dim: int = 32
    d_model: int = 128
    n_heads: int = 4
    n_encoder_layers: int = 2
    n_decoder_layers: int = 2

    @nn.compact
    def __call__(self, observation, action_chunk=None, z_key=None):
        # layers are explicitly named: the encoder branch is skipped at
        # inference, and flax auto-numbering must not shift across branches
        obs = jnp.asarray(observation, jnp.float32)
        B = obs.shape[0]
        obs_tok = nn.Dense(self.d_model, name="obs_proj")(obs)[:, None]

        if action_chunk is not None:
            # style encoder: [CLS, obs, a_1..a_N] transformer → (mu, log_var)
            acts = nn.Dense(self.d_model, name="act_proj")(
                jnp.asarray(action_chunk, jnp.float32)
            )
            cls = self.param(
                "cls", nn.initializers.normal(0.02), (1, 1, self.d_model)
            )
            seq = jnp.concatenate(
                [jnp.tile(cls, (B, 1, 1)), obs_tok, acts], 1
            )
            seq = seq + _sinusoidal_pos_enc(seq.shape[1], self.d_model)
            for i in range(self.n_encoder_layers):
                seq = _EncoderBlock(self.d_model, self.n_heads,
                                    name=f"enc_{i}")(seq)
            stats = nn.Dense(2 * self.latent_dim, name="latent_head")(
                seq[:, 0]
            )
            mu, log_var = jnp.split(stats, 2, -1)
            if z_key is None:
                raise ValueError("training mode needs z_key for sampling z")
            z = mu + jnp.exp(0.5 * log_var) * jax.random.normal(
                z_key, mu.shape
            )
        else:
            mu = jnp.zeros((B, self.latent_dim))
            log_var = jnp.zeros((B, self.latent_dim))
            z = mu

        # decoder: chunk_size learned queries attend over (obs, z) context
        z_tok = nn.Dense(self.d_model, name="z_proj")(z)[:, None]
        ctx = jnp.concatenate([obs_tok, z_tok], 1)
        queries = self.param(
            "queries", nn.initializers.normal(0.02),
            (1, self.chunk_size, self.d_model),
        )
        x = jnp.tile(queries, (B, 1, 1)) + _sinusoidal_pos_enc(
            self.chunk_size, self.d_model
        )
        for i in range(self.n_decoder_layers):
            h = nn.LayerNorm(name=f"dec_{i}_ln1")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model,
                name=f"dec_{i}_self",
            )(h, h)
            x = x + h
            h = nn.LayerNorm(name=f"dec_{i}_ln2")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model,
                name=f"dec_{i}_cross",
            )(h, ctx)
            x = x + h
            h = nn.LayerNorm(name=f"dec_{i}_ln3")(x)
            h = nn.Dense(4 * self.d_model, name=f"dec_{i}_mlp1")(h)
            h = nn.gelu(h)
            x = x + nn.Dense(self.d_model, name=f"dec_{i}_mlp2")(h)
        action_pred = nn.Dense(self.action_dim, name="action_head")(x)
        return action_pred, mu, log_var
