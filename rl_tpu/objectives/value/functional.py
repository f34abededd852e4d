"""Functional value-estimation kernels.

TPU re-design of the reference kernels
(``/root/reference/torchrl/objectives/value/functional.py``):
``generalized_advantage_estimate`` :120, ``_fast_vec_gae`` :211,
``vec_generalized_advantage_estimate`` :271, td0/td1/tdλ (+vec) :378-1296,
``vtrace_advantage_estimate`` :1298, ``reward2go`` :1386.

All kernels are **time-first** (axis 0 = T) and fully shape-agnostic beyond
that; inputs follow the reference's done semantics exactly:

* ``terminated`` cuts **bootstrapping** (no value beyond a true terminal);
* ``done`` (= terminated | truncated) cuts **trace accumulation** (the
  trajectory ends; at truncation we still bootstrap with V(s_{t+1})).

Each recurrence is provided twice: a ``lax.scan`` (reference "loop" path)
and a ``lax.associative_scan`` log-depth path (reference "vectorized" path);
tests assert bit-level agreement.  The associative form for
``y_t = d_t + g_t * y_{t+1}`` composes affine maps ``(g, d)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "generalized_advantage_estimate",
    "vec_generalized_advantage_estimate",
    "td0_return_estimate",
    "td0_advantage_estimate",
    "td1_return_estimate",
    "td1_advantage_estimate",
    "td_lambda_return_estimate",
    "td_lambda_advantage_estimate",
    "vec_td_lambda_return_estimate",
    "vtrace_advantage_estimate",
    "reward2go",
]


def _f32(*xs):
    return tuple(jnp.asarray(x, jnp.float32) for x in xs)


def _not(x):
    return 1.0 - jnp.asarray(x, jnp.float32)


def _reverse_affine_scan(g, d):
    """Solve ``y_t = d_t + g_t * y_{t+1}`` with ``y_T = 0`` for all t,
    in O(log T) depth via associative_scan over reversed affine maps."""

    def combine(b, a):
        # maps applied innermost-first along the reversed axis
        g_b, d_b = b
        g_a, d_a = a
        return g_b * g_a, d_a + g_a * d_b

    g_r = jnp.flip(g, 0)
    d_r = jnp.flip(d, 0)
    _, y_r = jax.lax.associative_scan(combine, (g_r, d_r), axis=0)
    return jnp.flip(y_r, 0)


def _reverse_scan(g, d):
    """Same recurrence via lax.scan (reference non-vectorized path)."""

    def body(carry, gd):
        g_t, d_t = gd
        y = d_t + g_t * carry
        return y, y

    _, ys = jax.lax.scan(body, jnp.zeros_like(d[0]), (g, d), reverse=True)
    return ys


# ---------------------------------------------------------------------------
# GAE


def generalized_advantage_estimate(
    gamma, lmbda, state_value, next_state_value, reward, done, terminated,
    *, vectorized: bool = True,
):
    """GAE(γ, λ) (reference functional.py:120 / vec :271).

    ``advantage_t = Σ_k (γλ)^k ∏(1-done) δ_{t+k}`` with
    ``δ_t = r_t + γ(1-terminated_t) V(s_{t+1}) - V(s_t)``.
    Returns ``(advantage, value_target)``.
    """
    state_value, next_state_value, reward = _f32(state_value, next_state_value, reward)
    not_term = _not(terminated)
    not_done = _not(done)
    delta = reward + gamma * not_term * next_state_value - state_value
    g = gamma * lmbda * not_done
    adv = (_reverse_affine_scan if vectorized else _reverse_scan)(g, delta)
    return adv, adv + state_value


vec_generalized_advantage_estimate = lambda *a, **k: generalized_advantage_estimate(
    *a, **k, vectorized=True
)


# ---------------------------------------------------------------------------
# TD(0)


def td0_return_estimate(gamma, next_state_value, reward, terminated):
    """``r + γ(1-terminated) V(s')`` (reference :378)."""
    next_state_value, reward = _f32(next_state_value, reward)
    return reward + gamma * _not(terminated) * next_state_value


def td0_advantage_estimate(gamma, state_value, next_state_value, reward, terminated):
    return td0_return_estimate(gamma, next_state_value, reward, terminated) - jnp.asarray(
        state_value, jnp.float32
    )


# ---------------------------------------------------------------------------
# TD(1) — Monte-Carlo with bootstrap at trace ends


def td1_return_estimate(
    gamma, next_state_value, reward, done, terminated, *, vectorized: bool = True
):
    """Full-rollout return, bootstrapping at truncations and the horizon
    (reference :520): ``G_t = r_t + γ[(1-done_t) G_{t+1} + done_t (1-term_t) V'_t]``,
    with the horizon treated as a truncation (``G_T-1`` bootstraps ``V'``).
    """
    next_state_value, reward = _f32(next_state_value, reward)
    not_term = _not(terminated)
    done_f = jnp.asarray(done, jnp.float32)
    # treat the last step as done for bootstrap purposes
    done_last = jnp.ones_like(done_f[-1:])
    done_eff = jnp.concatenate([done_f[:-1], done_last], axis=0)
    g = gamma * (1.0 - done_eff)
    d = reward + gamma * done_eff * not_term * next_state_value
    return (_reverse_affine_scan if vectorized else _reverse_scan)(g, d)


def td1_advantage_estimate(gamma, state_value, next_state_value, reward, done,
                           terminated, **kw):
    return td1_return_estimate(gamma, next_state_value, reward, done, terminated, **kw) \
        - jnp.asarray(state_value, jnp.float32)


# ---------------------------------------------------------------------------
# TD(λ)


def td_lambda_return_estimate(
    gamma, lmbda, next_state_value, reward, done, terminated,
    *, vectorized: bool = True,
):
    """λ-return (reference :780):
    ``G_t = r_t + γ(1-term_t)[(1-done_t)(λ G_{t+1} + (1-λ) V'_t) + done_t V'_t]``
    with horizon bootstrap ``G_{T-1} = r + γ(1-term) V'``.
    """
    next_state_value, reward = _f32(next_state_value, reward)
    not_term = _not(terminated)
    done_f = jnp.asarray(done, jnp.float32)
    done_last = jnp.ones_like(done_f[-1:])
    done_eff = jnp.concatenate([done_f[:-1], done_last], axis=0)
    cont = 1.0 - done_eff
    g = gamma * not_term * cont * lmbda
    d = reward + gamma * not_term * (
        cont * (1 - lmbda) * next_state_value + done_eff * next_state_value
    )
    return (_reverse_affine_scan if vectorized else _reverse_scan)(g, d)


def vec_td_lambda_return_estimate(*args, **kw):
    return td_lambda_return_estimate(*args, **kw, vectorized=True)


def td_lambda_advantage_estimate(gamma, lmbda, state_value, next_state_value,
                                 reward, done, terminated, **kw):
    return td_lambda_return_estimate(
        gamma, lmbda, next_state_value, reward, done, terminated, **kw
    ) - jnp.asarray(state_value, jnp.float32)


# ---------------------------------------------------------------------------
# V-trace (IMPALA)


def vtrace_advantage_estimate(
    gamma,
    log_pi,
    log_mu,
    state_value,
    next_state_value,
    reward,
    done,
    terminated,
    rho_thresh: float = 1.0,
    c_thresh: float = 1.0,
):
    """V-trace targets + advantages (Espeholt et al. 2018; reference :1298).

    Returns ``(advantage, value_target)`` where value_target = vs_t and
    ``advantage_t = ρ_t (r_t + γ(1-term_t) vs_{t+1} - V_t)``.
    """
    state_value, next_state_value, reward = _f32(state_value, next_state_value, reward)
    not_term = _not(terminated)
    not_done = _not(done)
    ratio = jnp.exp(jnp.asarray(log_pi, jnp.float32) - jnp.asarray(log_mu, jnp.float32))
    while ratio.ndim < reward.ndim:
        ratio = ratio[..., None]
    rho = jnp.minimum(rho_thresh, ratio)
    c = jnp.minimum(c_thresh, ratio)
    delta = rho * (reward + gamma * not_term * next_state_value - state_value)
    # vs_t - V_t = δ_t + γ(1-done_t) c_t (vs_{t+1} - V_{t+1})
    g = gamma * not_done * c
    correction = _reverse_affine_scan(g, delta)
    vs = correction + state_value
    vs_next = jnp.concatenate([vs[1:], next_state_value[-1:]], axis=0)
    # at trace ends the next state's vs is just its value estimate
    vs_next = not_done * vs_next + (1.0 - not_done) * next_state_value
    advantage = rho * (reward + gamma * not_term * vs_next - state_value)
    return advantage, vs


# ---------------------------------------------------------------------------
# reward-to-go


def reward2go(reward, done, gamma: float = 1.0):
    """Discounted reward-to-go within episodes (reference :1386)."""
    reward = jnp.asarray(reward, jnp.float32)
    g = gamma * _not(done)
    return _reverse_affine_scan(g, reward)
