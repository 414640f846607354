"""Batched bounded nonlinear least squares (Levenberg–Marquardt).

The TPU replacement for the reference's per-(object, band)
``scipy.optimize.curve_fit`` calls — ~61k independent bounded 5-parameter
fits executed serially through Fortran MINPACK/TRF
(reference: src/features/bazin_fitting.py:128-137, SURVEY.md §3.4).

Design:
- every fit is one vmapped lane of a fixed-iteration damped LM;
- box constraints via a sigmoid reparametrization
  theta = lb + (ub - lb) * sigmoid(u), so the solver is unconstrained in
  u-space (projection-free; matches scipy TRF quality in practice);
- multi-start: each lane runs S independent starts and keeps the lowest
  cost — the batched answer to TRF's better global behavior. Extra starts
  are nearly free on TPU (everything stays one big fused batch);
- per iteration: forward-mode Jacobian, P x P normal equations (tiny
  batched matmuls -> MXU), Marquardt lambda accept/reject.

Validated against scipy on the Bazin problem: ~98% of lanes reach
chi^2 <= 1.05x scipy's, median ratio 1.0 (tests/test_bazin.py).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    theta: jnp.ndarray  # [..., P] fitted parameters
    cost: jnp.ndarray  # [...] final sum of squared weighted residuals
    valid: jnp.ndarray  # [...] bool: finite result


def _chol_solve_small(A, b):
    """Solve SPD A x = b for tiny static P via fully-unrolled Cholesky.

    All operations are lane-elementwise scalars, so under vmap they become
    pure VPU vector math — much faster on TPU than the batched LAPACK-style
    ``jnp.linalg.solve`` for the ~61k tiny systems the LM builds each
    iteration."""
    P = A.shape[-1]
    L = [[None] * P for _ in range(P)]
    for i in range(P):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L z = b
    z = [None] * P
    for i in range(P):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * z[k]
        z[i] = s / L[i][i]
    # back substitution L^T x = z
    x = [None] * P
    for i in reversed(range(P)):
        s = z[i]
        for k in range(i + 1, P):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _lane_fit(model_fn, n_iters, lambda0, t, y, sigma, mask, theta0s, lb, ub):
    """Single-lane multi-start LM. theta0s: [S, P]."""
    span = ub - lb
    t_safe = jnp.where(mask, t, 0.0)
    sig = jnp.where(sigma > 0, sigma, 1.0)

    def to_theta(u):
        return lb + span * jax.nn.sigmoid(u)

    def u_of(theta):
        frac = jnp.clip((theta - lb) / jnp.where(span > 0, span, 1.0), 0.02, 0.98)
        return jnp.log(frac / (1.0 - frac))

    def resid(u):
        f = model_fn(t_safe, tuple(to_theta(u)))
        return jnp.where(mask, (f - y) / sig, 0.0)

    def cost_of(u):
        r = resid(u)
        return jnp.sum(r * r)

    jac = jax.jacfwd(resid)

    def run(u0):
        # convergence-masked early exit: a lane is converged after STALL
        # consecutive ACCEPTED steps whose relative cost improvement is
        # <= FTOL (scipy curve_fit's ftol semantics — rejected trials do
        # NOT count; mid-fit LM routinely rejects several trials while
        # lambda adapts, measured to false-trigger the 6-param TDE fits),
        # or once lambda has blown past 1e10 (trial steps are numerically
        # nil). Under the double vmap (lanes x starts) the while_loop
        # runs until EVERY lane is converged or at n_iters, so the
        # all-converged case skips the remaining iterations instead of
        # always paying n_iters serial damped steps (the LM kernel is
        # latency-bound on exactly those — PERF.md round-3 MFU section).
        # FTOL 1e-9 is 10x tighter than scipy's default ftol=1e-8; the
        # test_bazin/test_tde_models chi^2 gates pin the quality.
        FTOL, STALL = 1e-9, 3

        def cond(state):
            i, _, lam, _, stall = state
            return (i < n_iters) & (stall < STALL) & (lam < 1e10)

        def step(state):
            i, u, lam, c, stall = state
            r = resid(u)
            J = jnp.where(mask[:, None], jac(u), 0.0)
            g = J.T @ r
            H = J.T @ J
            d = jnp.clip(jnp.diag(H), 1e-10, None)
            delta = _chol_solve_small(H + lam * jnp.diag(d), -g)
            trial = jnp.clip(u + delta, -30.0, 30.0)
            c_trial = cost_of(trial)
            ok = jnp.isfinite(c_trial) & (c_trial < c)
            improved = ok & (c - c_trial > FTOL * (c + 1e-30))
            u = jnp.where(ok, trial, u)
            lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-12),
                            jnp.minimum(lam * 3.0, 1e12))
            c = jnp.where(ok, c_trial, c)
            stall = jnp.where(improved, 0,
                              jnp.where(ok, stall + 1, stall))
            return i + 1, u, lam, c, stall

        _, u, _, c, _ = jax.lax.while_loop(
            cond, step, (jnp.asarray(0), u0, jnp.asarray(lambda0),
                         cost_of(u0), jnp.asarray(0)))
        return u, c

    us, cs = jax.vmap(run)(jax.vmap(u_of)(theta0s))  # [S, P], [S]
    best = jnp.argmin(jnp.where(jnp.isfinite(cs), cs, jnp.inf))
    theta = to_theta(us[best])
    c = cs[best]
    valid = jnp.isfinite(c) & jnp.all(jnp.isfinite(theta))
    return LMResult(theta=theta, cost=c, valid=valid)


def lm_fit_batched(
    model_fn: Callable[[jnp.ndarray, tuple], jnp.ndarray],
    t: jnp.ndarray,  # [L, T]
    y: jnp.ndarray,
    sigma: jnp.ndarray,
    mask: jnp.ndarray,
    theta0: jnp.ndarray,  # [L, P] or [S, L, P] multi-start
    lb: jnp.ndarray,  # [L, P]
    ub: jnp.ndarray,
    n_iters: int = 80,
    lambda0: float = 1e-3,
) -> LMResult:
    """Fit ``model_fn(t, theta_tuple)`` on every lane; lowest-cost start wins.

    Guard semantics (n < min points, infeasible bounds) are the caller's
    responsibility — gate on ``valid`` plus problem-specific predicates.
    """
    if theta0.ndim == 2:
        theta0 = theta0[None]
    theta0 = jnp.moveaxis(theta0, 0, 1)  # [L, S, P]
    fit = functools.partial(_lane_fit, model_fn, n_iters, lambda0)
    return jax.vmap(fit)(t, y, sigma, mask, theta0, lb, ub)
