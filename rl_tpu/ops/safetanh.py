"""Numerically-safe tanh / atanh with exact analytic gradients.

TPU counterpart of the reference C++ autograd functions
(``/root/reference/torchrl/csrc/utils.cpp:9-48`` ``SafeTanh``/``SafeInvTanh``):
clamp the output to ``±(1 - eps)`` so downstream ``atanh``/``log1p`` never
sees ±1, while the backward uses the exact analytic derivative of the
*unclamped* function (``1 - y²`` and ``1/(1 - x²)``) — a ``jax.custom_vjp``
replaces the C++ autograd node.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["safetanh", "safeatanh"]


@jax.custom_vjp
def safetanh(x, eps: float = 1e-6):
    lim = 1.0 - eps
    return jnp.clip(jnp.tanh(x), -lim, lim)


def _safetanh_fwd(x, eps):
    y = safetanh(x, eps)
    return y, y


def _safetanh_bwd(y, g):
    return (g * (1 - y * y), None)


safetanh.defvjp(_safetanh_fwd, _safetanh_bwd)


@jax.custom_vjp
def safeatanh(y, eps: float = 1e-6):
    lim = 1.0 - eps
    return jnp.arctanh(jnp.clip(y, -lim, lim))


def _safeatanh_fwd(y, eps):
    lim = 1.0 - eps
    yc = jnp.clip(y, -lim, lim)
    return jnp.arctanh(yc), yc


def _safeatanh_bwd(yc, g):
    return (g / (1 - yc * yc), None)


safeatanh.defvjp(_safeatanh_fwd, _safeatanh_bwd)
