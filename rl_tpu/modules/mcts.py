"""MCTS node-scoring rules.

Counterparts of ``/root/reference/torchrl/modules/mcts/scores.py``:
``PUCTScore`` :34, ``UCBScore``, ``EXP3Score``, ``UCB1TunedScore`` (:34-441).
Pure functions over (win_count/value, visits, priors) arrays — usable inside
jitted tree searches over the MCTSForest storage.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["puct_score", "ucb_score", "ucb1_tuned_score", "exp3_score"]


def puct_score(q: jax.Array, prior: jax.Array, visits: jax.Array,
               parent_visits: jax.Array, c_puct: float = 1.0) -> jax.Array:
    """AlphaZero PUCT: ``Q + c·P·√N_parent/(1+N)`` (reference :34)."""
    return q + c_puct * prior * jnp.sqrt(parent_visits) / (1.0 + visits)


def ucb_score(q: jax.Array, visits: jax.Array, parent_visits: jax.Array,
              c: float = 2.0) -> jax.Array:
    """UCB1: ``Q + √(c·ln N_parent / N)``; unvisited nodes get +inf."""
    explore = jnp.sqrt(c * jnp.log(jnp.maximum(parent_visits, 1.0))
                       / jnp.maximum(visits, 1e-8))
    return jnp.where(visits > 0, q + explore, jnp.inf)


def ucb1_tuned_score(q: jax.Array, q_sq: jax.Array, visits: jax.Array,
                     parent_visits: jax.Array) -> jax.Array:
    """UCB1-Tuned with empirical-variance bound (reference :441)."""
    n = jnp.maximum(visits, 1e-8)
    logN = jnp.log(jnp.maximum(parent_visits, 1.0))
    var = jnp.maximum(q_sq - q**2, 0.0) + jnp.sqrt(2 * logN / n)
    bound = jnp.minimum(0.25, var)
    return jnp.where(visits > 0, q + jnp.sqrt(logN / n * bound), jnp.inf)


def exp3_score(rewards_sum: jax.Array, probs: jax.Array, gamma: float = 0.1,
               key=None) -> jax.Array:
    """EXP3 adversarial-bandit weights (reference EXP3Score).

    Returns updated sampling probabilities from cumulative importance-
    weighted rewards."""
    k = rewards_sum.shape[-1]
    w = jnp.exp(gamma * rewards_sum / k)
    w = w / w.sum(-1, keepdims=True)
    return (1 - gamma) * w + gamma / k
