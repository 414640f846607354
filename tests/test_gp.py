"""Batched 2D GP: NLL/posterior parity vs a NumPy oracle + hyperparameter
recovery + guard semantics. (george is not available in this image, so the
oracle is an independent dense NumPy implementation of the same model.)"""

import numpy as np
import pytest


def np_kernel(t, lam, amp, lt2, lw2):
    r = np.sqrt((t[:, None] - t[None, :]) ** 2 / lt2
                + (lam[:, None] - lam[None, :]) ** 2 / lw2 + 1e-30)
    s3 = np.sqrt(3.0)
    return amp * (1 + s3 * r) * np.exp(-s3 * r)


def np_nll(params, t, lam, y, yerr):
    mean, log_amp, log_lt2, log_lw2 = params
    K = np_kernel(t, lam, np.exp(log_amp), np.exp(log_lt2), np.exp(log_lw2))
    K = K + np.diag(yerr ** 2 + 1e-6)
    L = np.linalg.cholesky(K)
    r = y - mean
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, r))
    return 0.5 * (r @ alpha + 2 * np.log(np.diag(L)).sum()
                  + len(y) * np.log(2 * np.pi))


def _random_problem(rng, n=40, t_pad=48):
    t = np.sort(rng.uniform(0, 200, n)).astype(np.float32)
    lam = rng.choice([3670, 4825, 6222, 7545, 8691, 9710], n).astype(np.float32)
    K = np_kernel(t, lam, 2.0, 50.0 ** 2, 4000.0 ** 2)
    y = rng.multivariate_normal(np.zeros(n), K + 1e-6 * np.eye(n)).astype(np.float32)
    yerr = rng.uniform(0.05, 0.2, n).astype(np.float32)
    y = y + yerr * rng.standard_normal(n).astype(np.float32)

    tp = np.zeros(t_pad, np.float32)
    lp = np.zeros(t_pad, np.float32)
    yp = np.zeros(t_pad, np.float32)
    ep = np.ones(t_pad, np.float32)
    m = np.zeros(t_pad, bool)
    tp[:n], lp[:n], yp[:n], ep[:n], m[:n] = t, lam, y, yerr, True
    return (t, lam, y, yerr), (tp, lp, yp, ep, m)


def test_nll_matches_oracle():
    from mallorn_tpu.ops.gp import _nll
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    (t, lam, y, yerr), (tp, lp, yp, ep, m) = _random_problem(rng)
    params = np.array([0.3, np.log(1.5), 2 * np.log(60.0), 2 * np.log(5000.0)],
                      np.float32)
    want = np_nll(params.astype(np.float64), t.astype(np.float64),
                  lam.astype(np.float64), y.astype(np.float64),
                  yerr.astype(np.float64))
    got = float(_nll(jnp.asarray(params), jnp.asarray(tp), jnp.asarray(lp),
                     jnp.asarray(yp), jnp.asarray(ep), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_posterior_mean_matches_oracle():
    from mallorn_tpu.ops.gp import gp_predict
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    (t, lam, y, yerr), (tp, lp, yp, ep, m) = _random_problem(rng)
    params = np.array([0.1, np.log(2.0), 2 * np.log(50.0), 2 * np.log(4000.0)],
                      np.float32)
    ts = np.array([10.0, 80.0, 150.0], np.float32)
    ls = np.array([4825.0, 6222.0, 7545.0], np.float32)

    K = np_kernel(t.astype(np.float64), lam.astype(np.float64), 2.0, 50.0 ** 2,
                  4000.0 ** 2) + np.diag(yerr.astype(np.float64) ** 2 + 1e-6)
    ks = np_kernel(np.concatenate([ts, t]), np.concatenate([ls, lam]),
                   2.0, 50.0 ** 2, 4000.0 ** 2)[:3, 3:]
    want = ks @ np.linalg.solve(K, y - 0.1) + 0.1

    got = np.asarray(gp_predict(
        jnp.asarray(params)[None], jnp.asarray(tp)[None], jnp.asarray(lp)[None],
        jnp.asarray(yp)[None], jnp.asarray(ep)[None], jnp.asarray(m)[None],
        jnp.asarray(ts)[None], jnp.asarray(ls)[None]))[0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_hyperparameter_recovery():
    from mallorn_tpu.ops.gp import fit_gp_batched
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    lanes = [_random_problem(rng, n=60, t_pad=64)[1] for _ in range(6)]
    tp, lp, yp, ep, m = (np.stack(x) for x in zip(*lanes))
    fit = fit_gp_batched(jnp.asarray(tp), jnp.asarray(lp), jnp.asarray(yp),
                         jnp.asarray(ep), jnp.asarray(m), n_steps=300)
    assert bool(fit.valid.all())
    ts = np.sqrt(np.exp(np.asarray(fit.params[:, 2])))
    # true time scale 50 d; recovered within a factor of ~2.5 per lane
    assert np.all(ts > 15) and np.all(ts < 160), ts
    # NLL must beat the init for sampled-from-model data
    assert np.isfinite(np.asarray(fit.log_likelihood)).all()


def test_feature_guards(tiny_dataset):
    from mallorn_tpu.features import multiband_gp

    packed, meta, _ = tiny_dataset
    feats = multiband_gp.extract(packed, meta, n_steps=60)
    names = list(feats.keys())
    assert "gp2d_amplitude" in names and "gp_gr_slope_100d" in names
    assert len(names) == 5 + 4 * 5 + 2
    amp = np.asarray(feats["gp2d_amplitude"])
    # synthetic objects all have >= 10 points -> finite
    assert np.isfinite(amp).all()
    ts = np.asarray(feats["gp2d_time_scale"])
    assert (ts[np.isfinite(ts)] > 0).all()


def test_feature_guard_too_few_points():
    from mallorn_tpu.data.packing import pack_lightcurves
    from mallorn_tpu.features import multiband_gp

    rng = np.random.default_rng(3)
    n = 8  # < 10 points total
    packed = pack_lightcurves(
        np.zeros(n, np.int64), np.sort(rng.uniform(0, 100, n)),
        rng.uniform(10, 50, n), rng.uniform(0.5, 2, n),
        rng.integers(0, 6, n), 1)
    feats = multiband_gp.extract(packed, None, n_steps=20)
    for k, v in feats.items():
        assert np.isnan(np.asarray(v)[0]), k
