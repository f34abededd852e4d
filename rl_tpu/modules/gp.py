"""GP world model + RBF controller (PILCO components).

Counterparts of ``/root/reference/torchrl/modules/models/gp.py``
(``GPWorldModel`` :31) and ``rbf_controller.py`` (``RBFController`` :11).

The world model is an exact GP over state deltas with an ARD RBF kernel:
``fit`` precomputes the Cholesky factor on host-sized data; ``predict``
gives the posterior mean/variance; ``propagate`` pushes a Gaussian state
belief through the dynamics.  Where the reference implements full
moment-matching (gp.py:352 ``uncertain_forward``), we use the unscented
(sigma-point) transform — same mean/covariance contract, jittable, and
accurate to 2nd order without the kernel-specific closed forms.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict

__all__ = ["GPWorldModel", "RBFController", "unscented_transform"]


def _rbf_kernel(x1, x2, lengthscales, signal_var):
    """ARD RBF: k(a,b) = σ² exp(-½ Σ_d ((a_d-b_d)/l_d)²)."""
    diff = (x1[:, None, :] - x2[None, :, :]) / lengthscales
    return signal_var * jnp.exp(-0.5 * jnp.sum(diff * diff, -1))


class GPWorldModel:
    """Exact GP dynamics model predicting per-dim state deltas
    (reference gp.py:31): inputs ``[state ‖ action]``, targets
    ``next_state − state``, one independent GP per output dim sharing the
    input grid.
    """

    def __init__(self, state_dim: int, action_dim: int, *,
                 noise_var: float = 1e-4):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.noise_var = noise_var
        self._fit = None  # TDict(X, chol, alpha, lengthscales, signal_var)

    def init_hyperparams(self) -> TDict:
        d_in = self.state_dim + self.action_dim
        return TDict(
            log_lengthscales=jnp.zeros((self.state_dim, d_in)),
            log_signal_var=jnp.zeros((self.state_dim,)),
        )

    def fit(self, X, Y, hyper: TDict | None = None) -> TDict:
        """Precompute per-output-dim Cholesky factors and weights.

        ``X``: [N, state+action]; ``Y``: [N, state] deltas.  Returns the
        fitted state (a pytree — pass it to predict/propagate), also cached
        on the object for convenience (reference gp.py:152 caches too).
        """
        X = jnp.asarray(X, jnp.float32)
        Y = jnp.asarray(Y, jnp.float32)
        if hyper is None:
            hyper = self.init_hyperparams()
        ls = jnp.exp(jnp.asarray(hyper["log_lengthscales"]))
        sv = jnp.exp(jnp.asarray(hyper["log_signal_var"]))
        N = X.shape[0]

        def per_dim(ls_d, sv_d, y_d):
            K = _rbf_kernel(X, X, ls_d, sv_d) + self.noise_var * jnp.eye(N)
            chol = jnp.linalg.cholesky(K)
            alpha = jax.scipy.linalg.cho_solve((chol, True), y_d)
            return chol, alpha

        chols, alphas = jax.vmap(per_dim)(ls, sv, Y.T)
        fitted = TDict(X=X, chol=chols, alpha=alphas,
                       lengthscales=ls, signal_var=sv)
        self._fit = fitted
        return fitted

    def predict(self, x, fitted: TDict | None = None):
        """Posterior mean/var of the state delta at query points [M, d_in]."""
        f = fitted if fitted is not None else self._fit
        if f is None:
            raise RuntimeError("call fit() first")
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))

        def per_dim(ls_d, sv_d, chol_d, alpha_d):
            k_star = _rbf_kernel(x, f["X"], ls_d, sv_d)  # [M, N]
            mean = k_star @ alpha_d
            v = jax.scipy.linalg.solve_triangular(
                chol_d, k_star.T, lower=True
            )
            var = sv_d - jnp.sum(v * v, 0)
            return mean, jnp.maximum(var, 1e-9)

        means, variances = jax.vmap(per_dim)(
            f["lengthscales"], f["signal_var"], f["chol"], f["alpha"]
        )
        return means.T, variances.T  # [M, state_dim]

    def step(self, state, action, fitted: TDict | None = None):
        """Deterministic next-state mean (reference deterministic_forward
        gp.py:588)."""
        x = jnp.concatenate(
            [jnp.atleast_2d(state), jnp.atleast_2d(action)], -1
        )
        delta, var = self.predict(x, fitted)
        return state + delta, var

    def propagate(self, m, S, policy_fn, fitted: TDict | None = None):
        """Push belief N(m, S) through policy+dynamics via the unscented
        transform (reference uncertain_forward gp.py:352, moment matching).
        ``policy_fn(state) -> action``.  Returns (m', S')."""

        def dyn(s):
            a = policy_fn(s)
            x = jnp.concatenate([s, a], -1)[None]
            delta, var = self.predict(x, fitted)
            return s + delta[0], var[0]

        return unscented_transform(m, S, dyn)


def unscented_transform(m, S, fn, *, alpha: float = 1.0, kappa: float = 0.0):
    """Sigma-point propagation of N(m, S) through ``fn`` returning
    (mean, extra_diag_var).  Standard UT with 2D+1 points.

    ``alpha`` defaults to 1 (λ=0): the textbook small-α choice gives a
    large negative center weight that loses PSD-ness in float32 over long
    PILCO horizons (observed: NaN at horizon 25 on Pendulum)."""
    D = m.shape[-1]
    lam = alpha * alpha * (D + kappa) - D
    S_j = S + 1e-9 * jnp.eye(D)
    L = jnp.linalg.cholesky((D + lam) * S_j)
    pts = jnp.concatenate([m[None], m[None] + L.T, m[None] - L.T], 0)
    w_m = jnp.concatenate([
        jnp.array([lam / (D + lam)]),
        jnp.full((2 * D,), 0.5 / (D + lam)),
    ])
    w_c = w_m.at[0].add(1 - alpha * alpha + 2.0)
    ys, extra_vars = jax.vmap(fn)(pts)
    m_out = jnp.sum(w_m[:, None] * ys, 0)
    diff = ys - m_out
    S_out = jnp.einsum("i,ij,ik->jk", w_c, diff, diff)
    S_out = S_out + jnp.diag(jnp.sum(w_m[:, None] * extra_vars, 0))
    S_out = 0.5 * (S_out + S_out.T)  # keep symmetric for downstream chol
    return m_out, S_out


class RBFController:
    """RBF-network policy with sinusoidal squashing
    (reference rbf_controller.py:11): ``a = u_max · (9 sin(f) + sin(3f))/8``
    where ``f = Σ_i w_i exp(-½‖(s−c_i)/l‖²)`` — the PILCO paper's smooth,
    bounded, analytically differentiable controller."""

    def __init__(self, state_dim: int, action_dim: int, n_centers: int = 10,
                 *, u_max: float = 1.0):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.n_centers = n_centers
        self.u_max = u_max

    def init(self, key) -> TDict:
        k1, k2 = jax.random.split(key)
        return TDict(
            centers=jax.random.normal(
                k1, (self.n_centers, self.state_dim)
            ),
            weights=0.1 * jax.random.normal(
                k2, (self.n_centers, self.action_dim)
            ),
            log_lengthscales=jnp.zeros((self.state_dim,)),
        )

    @staticmethod
    def squash_sin(f, u_max):
        """Bounded squash (reference rbf_controller.py:82): keeps
        gradients alive near the bounds unlike a hard clip."""
        return u_max * (9 * jnp.sin(f) + jnp.sin(3 * f)) / 8.0

    def __call__(self, params: TDict, state):
        ls = jnp.exp(jnp.asarray(params["log_lengthscales"]))
        diff = (jnp.atleast_2d(state)[:, None, :]
                - jnp.asarray(params["centers"])[None]) / ls
        phi = jnp.exp(-0.5 * jnp.sum(diff * diff, -1))  # [B, n_centers]
        f = phi @ jnp.asarray(params["weights"])
        out = self.squash_sin(f, self.u_max)
        return out if jnp.ndim(state) > 1 else out[0]
