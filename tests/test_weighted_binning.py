"""Weighted quantile binning: the analog of XGBoost's weighted sketch.

The winning v92d config trains under non-uniform adversarial weights
(reference: train_v92_focal_adversarial.py:241); XGBoost's hist sketch is
weight-aware, so ours must be too.
"""

import numpy as np

from mallorn_tpu.trees import GBDTParams, apply_bins, fit_bins, predict_margin, train_gbdt


def _slow_weighted_quantile(col, w, q):
    """Oracle: inverted weighted CDF on finite values."""
    fin = np.isfinite(col)
    v, wt = col[fin], w[fin]
    order = np.argsort(v, kind="stable")
    v, wt = v[order], wt[order]
    cw = np.cumsum(wt)
    target = q * cw[-1]
    idx = np.searchsorted(cw, target, side="left")
    return v[min(idx, len(v) - 1)]


def test_weighted_edges_match_slow_oracle():
    rng = np.random.default_rng(0)
    n, f, n_bins = 500, 5, 16
    X = rng.normal(size=(n, f))
    X[rng.uniform(size=(n, f)) < 0.1] = np.nan
    w = rng.exponential(1.0, size=n) + 0.1

    spec = fit_bins(X, n_bins, sample_weight=w)
    edges = np.asarray(spec.edges)
    qs = np.linspace(0, 1, n_bins + 1)[1:-1]
    for j in range(f):
        want = np.unique([_slow_weighted_quantile(X[:, j], w, q) for q in qs])
        got = edges[j][np.isfinite(edges[j])]
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_uniform_weights_keep_unweighted_path():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(300, 4))
    a = fit_bins(X, 32)
    b = fit_bins(X, 32, sample_weight=np.full(300, 3.7))
    np.testing.assert_array_equal(np.asarray(a.edges), np.asarray(b.edges))


def test_skewed_weights_shift_edges():
    rng = np.random.default_rng(2)
    x = np.concatenate([rng.normal(-3, 0.1, 500), rng.normal(3, 0.1, 500)])
    w = np.concatenate([np.full(500, 1e-3), np.ones(500)])
    spec_u = fit_bins(x[:, None], 8)
    spec_w = fit_bins(x[:, None], 8, sample_weight=w)
    # weighted edges concentrate in the heavy (+3) cluster
    eu = np.asarray(spec_u.edges)[0]
    ew = np.asarray(spec_w.edges)[0]
    assert np.nanmedian(ew[np.isfinite(ew)]) > np.nanmedian(eu[np.isfinite(eu)])


def test_gbdt_uses_weighted_sketch_end_to_end():
    """Trained model must match the oracle fed the *weighted* bin spec."""
    from tests.oracles.gbdt_oracle import OracleGBDT

    rng = np.random.default_rng(3)
    n = 300
    X = rng.normal(size=(n, 6)).astype(np.float32)
    logit = 1.5 * X[:, 0] - 2.0 * X[:, 1]
    y = (logit + rng.normal(scale=0.5, size=n) > 0).astype(np.float32)
    w = (rng.exponential(1.0, size=n) + 0.2).astype(np.float32)

    params = GBDTParams(n_rounds=10, max_depth=3, learning_rate=0.1,
                        subsample=1.0, colsample_bytree=1.0,
                        min_child_weight=1.0, reg_alpha=0.0, reg_lambda=1.0,
                        n_bins=32)
    model = train_gbdt(X, y, params, sample_weight=w)

    spec = fit_bins(X, 32, sample_weight=w)
    np.testing.assert_array_equal(np.asarray(model.bin_spec.edges),
                                  np.asarray(spec.edges))
    binned = np.asarray(apply_bins(spec, X))
    oracle = OracleGBDT(n_rounds=10, max_depth=3, learning_rate=0.1,
                        reg_alpha=0.0, reg_lambda=1.0, min_child_weight=1.0,
                        n_bins=32)
    oracle.fit(binned, y.astype(np.float64), w.astype(np.float64))
    want = oracle.predict_margin(binned)
    ours = np.asarray(predict_margin(model, X, n_trees=params.n_rounds))
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_uniform_quantiles_matches_nanquantile():
    """The sort-based vectorized quantile path is bit-identical to
    np.nanquantile (incl. all-NaN, single-value, and inf columns)."""
    import warnings
    from mallorn_tpu.trees.binning import _uniform_quantiles

    rng = np.random.default_rng(11)
    X = rng.normal(size=(500, 40)) * rng.lognormal(size=40)
    X[rng.random(X.shape) < 0.25] = np.nan
    X[:, 3] = np.nan
    X[1:, 5] = np.nan
    X = np.clip(X, -1e10, 1e10)
    qs = np.linspace(0, 1, 33)[1:-1]
    got = _uniform_quantiles(X, qs)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = np.nanquantile(X, qs, axis=0).T
    np.testing.assert_array_equal(got, want)


def test_native_apply_bins_matches_numpy():
    """csrc/fast_bin.cpp == the numpy searchsorted loop, incl. NaN and
    clipping edge cases (skips when the toolchain is unavailable)."""
    from mallorn_tpu.trees.binning import _apply_bins_native, fit_bins

    rng = np.random.default_rng(12)
    X = rng.normal(size=(300, 25)).astype(np.float32)
    X[rng.random(X.shape) < 0.2] = np.nan
    X[0, 0] = np.inf
    X[1, 0] = -np.inf
    spec = fit_bins(X, 16)
    edges = np.asarray(spec.edges)
    got = _apply_bins_native(X, edges, spec.n_bins)
    if got is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    Xc = np.clip(X, -1e10, 1e10)
    want = np.empty(X.shape, np.int16)
    for j in range(X.shape[1]):
        want[:, j] = np.searchsorted(edges[j], Xc[:, j], side="right")
    want[np.isnan(X)] = spec.n_bins
    np.testing.assert_array_equal(got, want)


def test_fit_bins_folds_equals_per_fold():
    """fit_bins_folds (one global sort + per-fold gather) must be exactly
    equal to fit_bins on each fold's sliced matrix — uniform AND weighted,
    with NaN/inf/all-NaN-column edge cases."""
    from mallorn_tpu.trees.binning import fit_bins, fit_bins_folds

    rng = np.random.default_rng(7)
    n, f = 400, 23
    X = rng.normal(size=(n, f)).astype(np.float64)
    X[rng.random(X.shape) < 0.25] = np.nan
    X[:, 3] = np.nan  # all-NaN column
    X[0, 1], X[1, 1] = np.inf, -np.inf
    X[:, 5] = np.round(X[:, 5] * 2)  # heavy ties (stable-sort order matters)

    folds = [rng.choice(n, size=320, replace=False) for _ in range(4)]
    w_uniform = [np.ones(320, np.float32)] * 4
    w_mixed = [rng.random(320).astype(np.float32) + 0.5 for _ in range(4)]
    w_mixed[2] = np.ones(320, np.float32)  # one uniform fold among weighted

    for ws in (None, w_uniform, w_mixed):
        got = fit_bins_folds(X, folds, n_bins=16, sample_weights=ws)
        for k, idx in enumerate(folds):
            want = fit_bins(X[idx], 16,
                            sample_weight=None if ws is None else ws[k])
            np.testing.assert_array_equal(
                np.asarray(got[k].edges), np.asarray(want.edges),
                err_msg=f"fold {k} ws={'None' if ws is None else 'set'}")
            assert got[k].n_bins == want.n_bins


def test_apply_bins_folds_gather_matches_host():
    """Device fold binning (gather + compare-reduce) == per-fold host
    apply_bins_np + zero row padding, bit-exact, incl. NaN/inf/all-NaN
    columns and padded (negative) indices."""
    import jax.numpy as jnp

    from mallorn_tpu.trees.binning import (apply_bins_folds_gather,
                                           apply_bins_np, fit_bins)

    rng = np.random.default_rng(3)
    n, f, n_bins = 300, 17, 16
    X = rng.normal(size=(n, f)).astype(np.float32)
    X[rng.random(X.shape) < 0.2] = np.nan
    X[:, 4] = np.nan  # all-NaN column
    X[0, 2], X[1, 2] = np.inf, -np.inf
    X[:, 6] = np.round(X[:, 6])  # ties on bin edges

    folds = [rng.choice(n, size=220, replace=False) for _ in range(3)]
    specs = [fit_bins(X[idx], n_bins) for idx in folds]

    R = 256  # padded rows
    idx_pad = np.full((3, R), -1, np.int32)
    for k, idx in enumerate(folds):
        idx_pad[k, : len(idx)] = idx

    got = np.asarray(apply_bins_folds_gather(
        jnp.asarray(X), jnp.stack([s.edges for s in specs]),
        jnp.asarray(idx_pad), n_bins))

    for k, idx in enumerate(folds):
        want = np.zeros((R, f), np.int16)
        want[: len(idx)] = apply_bins_np(specs[k], X[idx])
        np.testing.assert_array_equal(got[k], want, err_msg=f"fold {k}")


def test_stack_folds_device_path_matches_host(monkeypatch):
    """_stack_folds with the device fold-binning path produces binned
    stacks identical to the host path (the fold-fit executables must see
    bit-identical inputs either way)."""
    from mallorn_tpu.trees.gbdt import GBDTParams, _stack_folds

    rng = np.random.default_rng(11)
    n, f = 260, 9
    Xp = rng.normal(size=(n, f)).astype(np.float32)
    Xp[rng.random(Xp.shape) < 0.15] = np.nan
    y = (rng.random(n) > 0.7).astype(np.float32)

    folds = []
    for k in range(3):
        va = np.nonzero(np.arange(n) % 3 == k)[0]
        tr = np.nonzero(np.arange(n) % 3 != k)[0]
        folds.append({"X": Xp[tr], "y": y[tr], "w": None,
                      "X_val": Xp[va], "y_val": y[va], "spw": 1.5,
                      "X_parent": Xp, "tr_idx": tr, "va_idx": va})

    params = GBDTParams(n_rounds=4, max_depth=2)
    args = (folds, params, 192, 96, None)

    monkeypatch.delenv("MALLORN_DEVICE_STACK", raising=False)
    arrs_host, specs_host, nf_host = _stack_folds(*args)
    monkeypatch.setenv("MALLORN_DEVICE_STACK", "1")
    arrs_dev, specs_dev, nf_dev = _stack_folds(*args)

    assert nf_host == nf_dev
    assert set(arrs_host) == set(arrs_dev)
    for k in arrs_host:
        np.testing.assert_array_equal(
            np.asarray(arrs_host[k]), np.asarray(arrs_dev[k]), err_msg=k)
    for sh, sd in zip(specs_host, specs_dev):
        np.testing.assert_array_equal(np.asarray(sh.edges),
                                      np.asarray(sd.edges))
