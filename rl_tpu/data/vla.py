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

import jax
import jax.numpy as jnp

from .tdict import TDict

__all__ = [
    "VLAImages", "VLAObservation", "VLAAction",
    "UniformActionTokenizer", "VocabTailActionTokenizer",
    "OpenVLAImagePreprocessor",
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


class OpenVLAImagePreprocessor:
    """OpenVLA-style image preprocessing: Lanczos3 resize, optional 0.9-area
    center crop (crop then resize back), and per-channel normalization.

    Counterpart of the reference ``OpenVLAImagePreprocessor``
    (``/root/reference/torchrl/data/vla/preprocessing.py:227``).  The
    reference's JPEG round-trip backends exist to reproduce TF-evaluation
    artifacts bit-for-bit on CPU; the TPU-native path is pure
    ``jax.image.resize`` with the ``lanczos3`` kernel (the same filter the
    OpenVLA-OFT eval uses), fully jittable and batchable.  Layout is NHWC
    (TPU-native; see CLAUDE.md deviations).

    Float inputs with max <= 1 are treated as [0, 1]; uint8 and other floats
    as [0, 255].  Output is float32 in [0, 1] before normalization.

    ``mean``/``std`` may be 1-D (one normalization) or 2-D (multiple
    normalizations of the same image concatenated along channels, as fused
    OpenVLA vision backbones expect).
    """

    def __init__(self, *, size: int = 224, center_crop: bool = False,
                 mean=None, std=None):
        if size < 1:
            raise ValueError(f"size must be >= 1, got {size}")
        self.size = int(size)
        self.center_crop = bool(center_crop)
        self.mean = None if mean is None else jnp.atleast_2d(jnp.asarray(mean, jnp.float32))
        self.std = None if std is None else jnp.atleast_2d(jnp.asarray(std, jnp.float32))

    def __call__(self, images) -> jnp.ndarray:
        x = jnp.asarray(images)
        if jnp.issubdtype(x.dtype, jnp.floating):
            # treat [0,1]-normalized floats as such; others as [0,255]
            x = jnp.where(jnp.max(jnp.abs(x)) <= 1.0, x, x / 255.0)
            x = x.astype(jnp.float32)
        else:
            x = x.astype(jnp.float32) / 255.0
        lead, hw = x.shape[:-3], x.shape[-3:-1]
        c = x.shape[-1]
        s = self.size
        out_shape = lead + (s, s, c)
        x = jax.image.resize(x, out_shape, method="lanczos3")
        if self.center_crop:
            # OpenVLA: crop sqrt(0.9) of each side centrally, resize back
            side = int(round(s * (0.9 ** 0.5)))
            off = (s - side) // 2
            x = x[..., off:off + side, off:off + side, :]
            x = jax.image.resize(x, out_shape, method="lanczos3")
        x = jnp.clip(x, 0.0, 1.0)
        if self.mean is not None or self.std is not None:
            mean = self.mean if self.mean is not None else jnp.zeros((1, c))
            std = self.std if self.std is not None else jnp.ones((1, c))
            if mean.shape[0] != std.shape[0]:
                raise ValueError("mean and std must have the same number of "
                                 "normalization rows")
            norms = [(x - m) / sd for m, sd in zip(mean, std)]
            x = jnp.concatenate(norms, axis=-1)
        return x
