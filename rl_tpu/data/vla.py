"""VLA (vision-language-action) data containers and action tokenizers.

Counterparts of ``/root/reference/torchrl/data/vla/containers.py``
(``VLAImages`` :15, ``VLAObservation`` :38, ``VLAAction`` :66) and
``tokenizers.py`` (``UniformActionTokenizer`` :53,
``VocabTailActionTokenizer`` :153).

Containers are TDict factories (the tensorclass → named-pytree mapping);
tokenizers are pure codecs over jnp arrays.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .tdict import TDict

__all__ = [
    "VLAImages", "VLAObservation", "VLAAction",
    "UniformActionTokenizer", "VocabTailActionTokenizer",
]


def VLAImages(image=None, wrist_image=None, extra=None) -> TDict:
    """Camera observations container (reference containers.py:15). NHWC."""
    out = {}
    if image is not None:
        out["image"] = image
    if wrist_image is not None:
        out["wrist_image"] = wrist_image
    if extra is not None:
        out["extra"] = extra
    return TDict(out)


def VLAObservation(images=None, state=None, instruction=None,
                   preprocessed=None) -> TDict:
    """VLA observation container (reference containers.py:38)."""
    out = {}
    if images is not None:
        out["images"] = images
    if state is not None:
        out["state"] = state
    if instruction is not None:
        out["instruction"] = instruction
    if preprocessed is not None:
        out["preprocessed"] = preprocessed
    return TDict(out)


def VLAAction(chunk=None, tokens=None, raw_tokens=None, logits=None,
              log_probs=None, mask=None) -> TDict:
    """VLA policy-output container (reference containers.py:66)."""
    out = {}
    for k, v in (("chunk", chunk), ("tokens", tokens),
                 ("raw_tokens", raw_tokens), ("logits", logits),
                 ("log_probs", log_probs), ("mask", mask)):
        if v is not None:
            out[k] = v
    return TDict(out)


class UniformActionTokenizer:
    """Per-dim uniform-bin action codec (RT-2 / OpenVLA style;
    reference tokenizers.py:53).  ``encode`` → bin index in
    ``[0, num_bins)``; ``decode`` → bin center.  Round-trip error is
    bounded by half a bin width."""

    def __init__(self, num_bins: int, *, low, high, action_dim=None):
        if num_bins < 1:
            raise ValueError(f"num_bins must be >= 1, got {num_bins}")
        low = jnp.asarray(low, jnp.float32)
        high = jnp.asarray(high, jnp.float32)
        if action_dim is not None:
            if low.ndim == 0:
                low = jnp.full((action_dim,), low)
            if high.ndim == 0:
                high = jnp.full((action_dim,), high)
        if not bool(jnp.all(high > low)):
            raise ValueError("high must be strictly greater than low")
        self.num_bins = int(num_bins)
        self.low = low
        self.high = high

    @property
    def vocab_size(self) -> int:
        return self.num_bins

    @property
    def action_dim(self):
        return self.low.shape[-1] if self.low.ndim else None

    def encode(self, actions):
        scaled = (jnp.asarray(actions, jnp.float32) - self.low) / (
            self.high - self.low
        )
        tokens = jnp.floor(scaled * self.num_bins).astype(jnp.int32)
        return jnp.clip(tokens, 0, self.num_bins - 1)

    def decode(self, tokens):
        centers = (jnp.asarray(tokens, jnp.float32) + 0.5) / self.num_bins
        return self.low + centers * (self.high - self.low)


class VocabTailActionTokenizer(UniformActionTokenizer):
    """Action bins mapped into the TAIL of an LLM vocabulary
    (reference tokenizers.py:153 — the OpenVLA trick of reusing the
    least-frequent text tokens as action tokens):
    ``token = vocab_size − num_bins + bin``."""

    def __init__(self, num_bins: int, *, vocab_size: int, low, high,
                 action_dim=None):
        super().__init__(num_bins, low=low, high=high, action_dim=action_dim)
        if vocab_size < num_bins:
            raise ValueError("vocab_size must be >= num_bins")
        self.full_vocab_size = int(vocab_size)
        self.offset = int(vocab_size) - int(num_bins)

    @property
    def vocab_size(self) -> int:
        return self.full_vocab_size

    def encode(self, actions):
        return super().encode(actions) + self.offset

    def decode(self, tokens):
        bins = jnp.clip(
            jnp.asarray(tokens, jnp.int32) - self.offset, 0,
            self.num_bins - 1,
        )
        return super().decode(bins)
