"""PRNG plumbing.

The reference chains per-worker integer seeds (``seed_generator``
``/root/reference/torchrl/_utils.py:543``).  In JAX the idiomatic equivalent
is splitting ``jax.random`` keys; these helpers bridge integer-seed APIs to
key-based ones and provide deterministic per-worker/per-env key folds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["seed_generator", "key_from_seed", "split_key", "fold_in"]


def seed_generator(seed: int) -> int:
    """Deterministically derive the next integer seed in a chain.

    Mirrors the reference's ``seed_generator`` (_utils.py:543) semantics:
    a fixed bijective-ish hash so worker seeds don't collide.
    """
    max_seed_val = (2 ** 62) - 1
    return int((seed * 1103515245 + 12345) % max_seed_val)


def key_from_seed(seed) -> jax.Array:
    if isinstance(seed, jax.Array) and jnp.issubdtype(seed.dtype, jax.dtypes.prng_key):
        return seed
    return jax.random.PRNGKey(int(seed))


def split_key(key, num: int = 2):
    return jax.random.split(key, num)


def fold_in(key, data: int) -> jax.Array:
    return jax.random.fold_in(key, data)
