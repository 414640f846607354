"""Batched (vmapped) fold training must match sequential fold training."""

import numpy as np
import pytest

from mallorn_tpu.train.cv import train_cv
from mallorn_tpu.trees.gbdt import GBDTParams


@pytest.mark.slow
def test_batched_equals_sequential():
    rng = np.random.default_rng(0)
    n = 400
    X = rng.normal(size=(n, 8)).astype(np.float32)
    y = ((X[:, 0] - X[:, 1] + rng.normal(0, 0.4, n)) > 0).astype(np.float32)
    X[rng.uniform(size=n) < 0.1, 2] = np.nan
    w = rng.uniform(0.5, 2.0, n)

    p = GBDTParams(n_rounds=40, max_depth=3, learning_rate=0.15)
    a = train_cv(X, y, X, p, sample_weight=w, batched_folds=True)
    b = train_cv(X, y, X, p, sample_weight=w, batched_folds=False)

    np.testing.assert_allclose(a.oof_preds, b.oof_preds, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(a.test_preds, b.test_preds, rtol=2e-4, atol=2e-5)
    assert a.best_f1 == b.best_f1
    for ma, mb in zip(a.models, b.models):
        np.testing.assert_array_equal(np.asarray(ma.forest.feature),
                                      np.asarray(mb.forest.feature))
        assert ma.best_iteration == mb.best_iteration


def test_predict_margin_folds_matches_sequential():
    """One vmapped all-fold predict == per-model predicts, including the
    per-fold best_iteration truncation mask."""
    from mallorn_tpu.trees.gbdt import (predict_margin, predict_margin_folds,
                                        train_gbdt)

    rng = np.random.default_rng(1)
    n = 300
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = ((X[:, 0] + rng.normal(0, 0.5, n)) > 0).astype(np.float32)
    X[rng.uniform(size=n) < 0.1, 1] = np.nan
    Xq = rng.normal(size=(77, 6)).astype(np.float32)

    p = GBDTParams(n_rounds=30, max_depth=3, learning_rate=0.2)
    models = []
    for seed in (0, 1, 2):
        tr = rng.permutation(n)[:220]
        va = np.setdiff1d(np.arange(n), tr)
        models.append(train_gbdt(
            X[tr], y[tr], p._replace(seed=seed),
            X_val=X[va], y_val=y[va], early_stopping_rounds=5))
    assert any(m.best_iteration >= 0 for m in models)

    got = predict_margin_folds(models, Xq)
    for i, m in enumerate(models):
        np.testing.assert_allclose(got[i], np.asarray(predict_margin(m, Xq)),
                                   rtol=1e-5, atol=1e-6)


def test_predict_margin_folds_lossguide_and_per_fold_X():
    """Fold-batched prediction works for leaf-wise (LGForest) models and
    for per-fold (ragged) input lists."""
    from mallorn_tpu.trees.gbdt import (predict_margin, predict_margin_folds,
                                        train_gbdt)

    rng = np.random.default_rng(2)
    n = 260
    X = rng.normal(size=(n, 7)).astype(np.float32)
    y = ((X[:, 0] - X[:, 2] + rng.normal(0, 0.4, n)) > 0).astype(np.float32)
    p = GBDTParams(n_rounds=25, max_depth=4, learning_rate=0.2,
                   grow_policy="lossguide", max_leaves=7)
    models = [train_gbdt(X, y, p._replace(seed=s)) for s in (0, 1)]

    # shared X
    Xq = rng.normal(size=(90, 7)).astype(np.float32)
    got = predict_margin_folds(models, Xq)
    for i, m in enumerate(models):
        np.testing.assert_allclose(got[i], np.asarray(predict_margin(m, Xq)),
                                   rtol=1e-5, atol=1e-6)

    # ragged per-fold X list (padded internally, trimmed by caller)
    Xa = rng.normal(size=(40, 7)).astype(np.float32)
    Xb = rng.normal(size=(65, 7)).astype(np.float32)
    got2 = predict_margin_folds(models, [Xa, Xb])
    np.testing.assert_allclose(got2[0][:40],
                               np.asarray(predict_margin(models[0], Xa)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got2[1][:65],
                               np.asarray(predict_margin(models[1], Xb)),
                               rtol=1e-5, atol=1e-6)


def test_extra_train_rows_shape_oof_on_primary_only():
    """v16 combination: external rows enter training, never validation."""
    from mallorn_tpu.train.cv import train_cv
    from mallorn_tpu.trees.gbdt import GBDTParams

    rng = np.random.default_rng(5)
    n, f = 300, 12
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (X[:, 0] + 0.3 * rng.normal(size=n) > 0.8).astype(int)
    # external set with an OBVIOUS extra signal column the primary lacks
    Xe = rng.normal(size=(150, f)).astype(np.float32)
    ye = (Xe[:, 0] > 0.8).astype(int)

    p = GBDTParams(n_rounds=20, max_depth=3)
    cv = train_cv(X, y, None, p, extra_train=(Xe, ye))
    assert cv.oof_preds.shape == (n,)       # OOF is primary-only
    assert np.isfinite(cv.best_f1)
    # the fold models actually saw the external rows: their padded row
    # budget includes them
    cv_plain = train_cv(X, y, None, p)
    assert not np.allclose(cv.oof_preds, cv_plain.oof_preds)
