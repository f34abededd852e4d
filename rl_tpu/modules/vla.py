"""TinyVLA: a small, dependency-free vision-language-action policy.

Counterpart of ``/root/reference/torchrl/modules/vla/models.py``
(``TinyVLA`` :31) and ``common.py`` (``VLAWrapperBase`` :40): conv image
encoder + proprioceptive-state MLP + hashed language-instruction embedding
fused into a trunk feeding a continuous action-chunk head or a discrete
action-token head.  Images are NHWC (TPU-native; the reference is NCHW).

The instruction is hashed host-side to an embedding index
(:func:`hash_instruction`) — deterministic and tokenizer-free, so the
policy is genuinely language-conditioned with zero external deps.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl_tpu.data import TDict

__all__ = ["TinyVLA", "hash_instruction"]


def hash_instruction(instruction: str, text_vocab: int = 256) -> int:
    """Deterministic string → embedding index (FNV-1a, host-side)."""
    h = 2166136261
    for ch in instruction.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h % text_vocab


class TinyVLA(nn.Module):
    """Tiny VLA backbone (reference vla/models.py:31).

    ``__call__(image, state, instruction_idx)`` → continuous chunk
    ``[B, chunk_size, action_dim]`` (``action_head="continuous"``) or token
    logits ``[B, chunk_size, action_dim, vocab_size]``
    (``action_head="tokens"``).
    """

    action_dim: int
    chunk_size: int = 1
    action_head: str = "continuous"
    vocab_size: int = 256
    use_state: bool = True
    hidden_dim: int = 128
    text_vocab: int = 256
    text_dim: int = 32

    @nn.compact
    def __call__(self, image, state=None, instruction_idx=None):
        img = jnp.asarray(image, jnp.float32) / 255.0
        lead = img.shape[:-3]
        x = img.reshape((-1,) + img.shape[-3:])
        for ch in (16, 32, 64):
            x = nn.relu(nn.Conv(ch, (3, 3), strides=(2, 2))(x))
        x = x.reshape(lead + (-1,))
        feats = [nn.Dense(self.hidden_dim)(x)]
        if self.use_state and state is not None:
            s = jnp.asarray(state, jnp.float32)
            feats.append(nn.Dense(self.hidden_dim)(nn.tanh(nn.Dense(64)(s))))
        if instruction_idx is not None:
            emb = nn.Embed(self.text_vocab, self.text_dim)(
                jnp.asarray(instruction_idx, jnp.int32)
            )
            feats.append(nn.Dense(self.hidden_dim)(emb))
        h = nn.relu(sum(feats))
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        if self.action_head == "tokens":
            logits = nn.Dense(
                self.chunk_size * self.action_dim * self.vocab_size
            )(h)
            return logits.reshape(
                lead + (self.chunk_size, self.action_dim, self.vocab_size)
            )
        chunk = nn.Dense(self.chunk_size * self.action_dim)(h)
        return jnp.tanh(
            chunk.reshape(lead + (self.chunk_size, self.action_dim))
        )
