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
