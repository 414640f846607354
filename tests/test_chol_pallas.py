"""Lane-batched Cholesky / fused inverse kernels vs NumPy (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from mallorn_tpu.ops.chol_pallas import cholesky_inverse_lanes, cholesky_lanes


def _spd(b, t, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(b, t, t))
    return (A @ A.transpose(0, 2, 1) + t * np.eye(t)).astype(np.float32)


def test_cholesky_lanes_matches_numpy():
    K = _spd(5, 24)
    L = np.asarray(cholesky_lanes(jnp.asarray(K)))
    np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=2e-5, atol=2e-5)
    assert np.max(np.abs(np.triu(L, 1))) == 0.0


def test_cholesky_inverse_lanes_matches_numpy():
    K = _spd(3, 32, seed=1)
    Linv, ld = cholesky_inverse_lanes(jnp.asarray(K))
    Linv, ld = np.asarray(Linv), np.asarray(ld)
    Lref = np.linalg.cholesky(K)
    np.testing.assert_allclose(
        Linv, np.stack([np.linalg.inv(l) for l in Lref]),
        rtol=5e-5, atol=5e-5)
    want_ld = 2 * np.log(np.diagonal(Lref, axis1=1, axis2=2)).sum(1)
    np.testing.assert_allclose(ld, want_ld, rtol=1e-5, atol=1e-4)
    # Kinv recombination (how the GP consumes it)
    Kinv = Linv.transpose(0, 2, 1) @ Linv
    np.testing.assert_allclose(Kinv, np.linalg.inv(K), rtol=1e-4, atol=1e-5)


def test_batched_grad_lanes_matches_vmapped_analytic():
    """The lanes GP gradient path == the per-lane analytic one (CPU
    interpret; on TPU the lanes path is 16x closer to f64 — see PERF.md)."""
    from mallorn_tpu.ops.gp import (_batched_nll_grad_lanes,
                                    _nll_and_grad_analytic)

    rng = np.random.default_rng(2)
    N, T = 4, 40
    t = np.sort(rng.uniform(0, 200, (N, T))).astype(np.float32)
    lam = rng.choice([3670.0, 4826, 6223], (N, T)).astype(np.float32)
    y = rng.normal(size=(N, T)).astype(np.float32)
    yerr = (0.1 + rng.random((N, T))).astype(np.float32)
    mask = rng.random((N, T)) < 0.7
    params = np.stack([np.full(N, 0.1), np.zeros(N),
                       np.full(N, 2 * np.log(100.0)),
                       np.full(N, 2 * np.log(6000.0))], 1).astype(np.float32)
    dt2 = (t[:, :, None] - t[:, None, :]) ** 2
    dl2 = (lam[:, :, None] - lam[:, None, :]) ** 2
    args = tuple(jnp.asarray(a) for a in (params, dt2, dl2, y, yerr, mask))
    nll_a, g_a = jax.vmap(_nll_and_grad_analytic, in_axes=(0,) * 6)(*args)
    nll_b, g_b = _batched_nll_grad_lanes(*args)
    np.testing.assert_allclose(np.asarray(nll_b), np.asarray(nll_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a),
                               rtol=2e-3, atol=2e-3)
