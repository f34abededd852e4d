"""Probability distributions for policy heads.

Pure-JAX re-implementations of the reference distribution zoo
(``/root/reference/torchrl/modules/distributions/continuous.py`` and
``discrete.py``); each class cites its original.  All are immutable pytrees
of parameters with ``sample / log_prob / entropy / mode / mean``; sampling
is reparameterized where the original is.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from rl_tpu.ops.safetanh import safeatanh, safetanh

__all__ = [
    "Distribution",
    "IndependentNormal",
    "TanhNormal",
    "TruncatedNormal",
    "Delta",
    "TanhDelta",
    "Categorical",
    "OneHotCategorical",
    "MaskedCategorical",
    "MaskedOneHotCategorical",
    "LLMMaskedCategorical",
    "Ordinal",
]

_LOG_SQRT_2PI = 0.5 * math.log(2 * math.pi)


def _sum_rightmost(x, ndims: int):
    if ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-ndims, 0)))


class Distribution:
    """Minimal distribution interface."""

    event_ndims: int = 0

    def sample(self, key, sample_shape=()):
        raise NotImplementedError

    def rsample(self, key, sample_shape=()):
        return self.sample(key, sample_shape)

    def log_prob(self, value):
        raise NotImplementedError

    def entropy(self):
        raise NotImplementedError

    @property
    def mode(self):
        raise NotImplementedError

    @property
    def mean(self):
        raise NotImplementedError

    def deterministic_sample(self, exploration: str, key=None):
        """Sample per exploration type (reference interaction types,
        envs/utils.py:34): RANDOM draws, MODE/MEAN/DETERMINISTIC pick."""
        if exploration == "RANDOM":
            return self.rsample(key)
        if exploration == "MODE":
            return self.mode
        if exploration in ("MEAN", "DETERMINISTIC"):
            return self.mean
        raise ValueError(f"unknown exploration type {exploration}")


class IndependentNormal(Distribution):
    """Diagonal Gaussian over the last dim (reference continuous.py:46)."""

    event_ndims = 1

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
        return self.loc + self.scale * jax.random.normal(key, shape, self.loc.dtype)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        lp = -0.5 * z * z - jnp.log(self.scale) - _LOG_SQRT_2PI
        return _sum_rightmost(lp, self.event_ndims)

    def entropy(self):
        h = 0.5 + _LOG_SQRT_2PI + jnp.log(self.scale)
        return _sum_rightmost(h, self.event_ndims)

    @property
    def mode(self):
        return self.loc

    @property
    def mean(self):
        return self.loc


class TanhNormal(Distribution):
    """tanh-squashed Gaussian, optionally rescaled to ``[low, high]``.

    Reference: continuous.py:336 (``TanhNormal``), using the safe tanh pair
    (csrc/utils.cpp via ``SafeTanhTransform`` continuous.py:137).
    ``upscale`` mirrors the reference's pre-tanh scaling of ``loc``.
    """

    event_ndims = 1

    def __init__(self, loc, scale, low=-1.0, high=1.0, upscale=5.0, event_ndims: int = 1):
        self.raw_loc = jnp.asarray(loc)
        self.loc = upscale * jnp.tanh(self.raw_loc / upscale) if upscale else self.raw_loc
        self.scale = jnp.asarray(scale)
        self.low = jnp.asarray(low, self.loc.dtype)
        self.high = jnp.asarray(high, self.loc.dtype)
        self.event_ndims = event_ndims

    def _squash(self, x):
        t = safetanh(x)
        return self.low + (t + 1.0) * 0.5 * (self.high - self.low)

    def _unsquash(self, y):
        t = (y - self.low) / (self.high - self.low) * 2.0 - 1.0
        return safeatanh(t)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
        x = self.loc + self.scale * jax.random.normal(key, shape, self.loc.dtype)
        return self._squash(x)

    def log_prob(self, value):
        x = self._unsquash(value)
        z = (x - self.loc) / self.scale
        base = -0.5 * z * z - jnp.log(self.scale) - _LOG_SQRT_2PI
        # |d tanh(x)/dx| = 1 - tanh(x)^2 ; plus the affine range rescale
        t = safetanh(x)
        log_det = jnp.log1p(-(t * t) + 1e-6) + jnp.log((self.high - self.low) * 0.5)
        return _sum_rightmost(base - log_det, self.event_ndims)

    def entropy(self):
        raise NotImplementedError(
            "TanhNormal has no closed-form entropy; use -log_prob(sample)"
        )

    @property
    def mode(self):
        return self._squash(self.loc)

    @property
    def mean(self):
        # no closed form; the reference uses the squashed loc as proxy
        return self._squash(self.loc)


class TruncatedNormal(Distribution):
    """Gaussian truncated to ``[low, high]`` (reference continuous.py:170,
    analytic impl truncated_normal.py:23-139)."""

    event_ndims = 1

    def __init__(self, loc, scale, low=-1.0, high=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.low = jnp.asarray(low, self.loc.dtype)
        self.high = jnp.asarray(high, self.loc.dtype)

    def _alpha_beta(self):
        a = (self.low - self.loc) / self.scale
        b = (self.high - self.loc) / self.scale
        return a, b

    @staticmethod
    def _phi(x):
        return jnp.exp(-0.5 * x * x) / math.sqrt(2 * math.pi)

    @staticmethod
    def _Phi(x):
        return 0.5 * (1 + jax.scipy.special.erf(x / math.sqrt(2.0)))

    def sample(self, key, sample_shape=()):
        a, b = self._alpha_beta()
        shape = tuple(sample_shape) + jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
        u = jax.random.uniform(key, shape, self.loc.dtype, 1e-6, 1 - 1e-6)
        Fa, Fb = self._Phi(a), self._Phi(b)
        z = jax.scipy.special.ndtri(Fa + u * (Fb - Fa))
        z = jnp.clip(z, a, b)
        return self.loc + self.scale * z

    def log_prob(self, value):
        a, b = self._alpha_beta()
        z = (value - self.loc) / self.scale
        Z = self._Phi(b) - self._Phi(a)
        lp = -0.5 * z * z - _LOG_SQRT_2PI - jnp.log(self.scale) - jnp.log(Z + 1e-12)
        in_support = (value >= self.low) & (value <= self.high)
        lp = jnp.where(in_support, lp, -jnp.inf)
        return _sum_rightmost(lp, self.event_ndims)

    @property
    def mode(self):
        return jnp.clip(self.loc, self.low, self.high)

    @property
    def mean(self):
        a, b = self._alpha_beta()
        Z = self._Phi(b) - self._Phi(a)
        return self.loc + self.scale * (self._phi(a) - self._phi(b)) / (Z + 1e-12)


class Delta(Distribution):
    """Deterministic distribution (reference continuous.py:599)."""

    event_ndims = 1

    def __init__(self, param, atol=1e-6):
        self.param = jnp.asarray(param)
        self.atol = atol

    def sample(self, key=None, sample_shape=()):
        if sample_shape:
            return jnp.broadcast_to(self.param, tuple(sample_shape) + self.param.shape)
        return self.param

    def log_prob(self, value):
        is_eq = jnp.all(jnp.abs(value - self.param) < self.atol, axis=-1)
        return jnp.where(is_eq, 0.0, -jnp.inf)

    def entropy(self):
        return jnp.zeros(self.param.shape[:-1])

    @property
    def mode(self):
        return self.param

    @property
    def mean(self):
        return self.param


class TanhDelta(Delta):
    """tanh-squashed Delta (reference continuous.py:685)."""

    def __init__(self, param, low=-1.0, high=1.0, atol=1e-6):
        low, high = jnp.asarray(low), jnp.asarray(high)
        squashed = low + (safetanh(jnp.asarray(param)) + 1.0) * 0.5 * (high - low)
        super().__init__(squashed, atol)


class Categorical(Distribution):
    """Integer-valued categorical over logits' last dim."""

    def __init__(self, logits=None, probs=None):
        if logits is None:
            logits = jnp.log(jnp.asarray(probs) + 1e-12)
        self.logits = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    @property
    def probs(self):
        return jnp.exp(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.logits.shape[:-1]
        return jax.random.categorical(key, self.logits, shape=shape)

    def log_prob(self, value):
        value = jnp.asarray(value, jnp.int32)
        return jnp.take_along_axis(self.logits, value[..., None], axis=-1).squeeze(-1)

    def entropy(self):
        return -jnp.sum(jnp.exp(self.logits) * self.logits, axis=-1)

    @property
    def mode(self):
        return jnp.argmax(self.logits, axis=-1)

    @property
    def mean(self):
        return self.mode  # integer support: mean == most-likely for acting


class OneHotCategorical(Categorical):
    """One-hot-valued categorical (reference discrete.py:65)."""

    def sample(self, key, sample_shape=()):
        idx = super().sample(key, sample_shape)
        return jax.nn.one_hot(idx, self.logits.shape[-1], dtype=jnp.bool_)

    def log_prob(self, value):
        idx = jnp.argmax(jnp.asarray(value, jnp.int32), axis=-1)
        return super().log_prob(idx)

    @property
    def mode(self):
        return jax.nn.one_hot(
            jnp.argmax(self.logits, axis=-1), self.logits.shape[-1], dtype=jnp.bool_
        )

    @property
    def mean(self):
        return self.mode


class MaskedCategorical(Categorical):
    """Categorical with invalid actions masked out (reference discrete.py:175).

    ``mask``: bool, True = allowed.  Masked logits become -inf; ``log_prob``
    of a masked action is -inf (``neg_inf`` configurable).
    """

    def __init__(self, logits=None, probs=None, mask=None, neg_inf: float = -1e9):
        if logits is None:
            logits = jnp.log(jnp.asarray(probs) + 1e-12)
        logits = jnp.asarray(logits)
        if mask is not None:
            logits = jnp.where(jnp.asarray(mask, bool), logits, neg_inf)
        self.mask = mask
        super().__init__(logits=logits)


class Ordinal(Categorical):
    """Ordinal-regression parameterization of a categorical
    (reference discrete.py:620): transforms raw scores so adjacent classes
    get ordered cumulative structure."""

    def __init__(self, scores):
        scores = jnp.asarray(scores)
        # logit_k = sum_{i<=k} log sigmoid(s_i) + sum_{i>k} log sigmoid(-s_i)
        larger = jax.nn.log_sigmoid(scores)
        smaller = jax.nn.log_sigmoid(-scores)
        cum_larger = jnp.cumsum(larger, axis=-1)
        rev_cum_smaller = jnp.flip(jnp.cumsum(jnp.flip(smaller, -1), axis=-1), -1)
        tail_smaller = rev_cum_smaller - smaller
        super().__init__(logits=cum_larger + tail_smaller)


class MaskedOneHotCategorical(MaskedCategorical):
    """One-hot-encoded masked categorical (reference discrete.py:437):
    samples/modes are one-hot vectors, log_prob accepts one-hot values."""

    def sample(self, key, sample_shape=()):
        idx = super().sample(key, sample_shape)
        return jax.nn.one_hot(idx, self.logits.shape[-1], dtype=jnp.float32)

    def log_prob(self, value):
        return super().log_prob(jnp.argmax(jnp.asarray(value), -1))

    @property
    def mode(self):
        return jax.nn.one_hot(
            jnp.argmax(self.logits, -1), self.logits.shape[-1],
            dtype=jnp.float32,
        )

    @property
    def mean(self):
        return self.probs


class LLMMaskedCategorical(Distribution):
    """Token-level masked categorical for LLM losses
    (reference discrete.py:699).

    Wraps [B, T, V] logits with a [B, T] validity mask (prompt/padding
    positions excluded).  Unlike ``MaskedCategorical`` the mask is over
    *positions*, not classes: ``log_prob`` returns 0 at masked positions so
    sums over the sequence only count response tokens; ``entropy`` is
    likewise masked.  Sampling at masked positions returns token 0.
    """

    def __init__(self, logits, mask):
        self.logits = jnp.asarray(logits)
        self.position_mask = jnp.asarray(mask, bool)

    def _log_softmax(self):
        return jax.nn.log_softmax(self.logits, -1)

    def sample(self, key, sample_shape=()):
        idx = jax.random.categorical(
            key, self.logits, -1,
            shape=tuple(sample_shape) + self.logits.shape[:-1],
        )
        return jnp.where(self.position_mask, idx, 0)

    def log_prob(self, value):
        logp = jnp.take_along_axis(
            self._log_softmax(), jnp.asarray(value, jnp.int32)[..., None], -1
        )[..., 0]
        return jnp.where(self.position_mask, logp, 0.0)

    def entropy(self):
        logp = self._log_softmax()
        ent = -jnp.sum(jnp.exp(logp) * logp, -1)
        return jnp.where(self.position_mask, ent, 0.0)

    @property
    def mode(self):
        return jnp.where(self.position_mask, jnp.argmax(self.logits, -1), 0)
