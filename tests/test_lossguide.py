"""Leaf-wise (lossguide) tree growth — the LightGBM capability
(reference: scripts/train_baseline.py:169-234 LGBM blend,
train_v110_lgbm_regularized.py:124-125 num_leaves=15/max_depth=4,
train_v111_lgbm_dart.py DART + leaf-wise).
"""

import numpy as np
import pytest

from mallorn_tpu.trees.gbdt import (GBDTParams, LGForest, predict_margin,
                                    predict_proba, train_gbdt)


def _make_data(n=500, f=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    logit = 1.5 * X[:, 0] - 2.0 * X[:, 1] + X[:, 2] * X[:, 3]
    y = (logit + rng.normal(scale=0.5, size=n) > 0).astype(np.float32)
    X[rng.uniform(size=n) < 0.1, 4] = np.nan
    return X, y


def test_full_leaf_budget_equals_depthwise():
    """With max_leaves = 2^D and depth cap D, leaf-wise growth makes the
    same (node-local) split decisions as depth-wise — predictions must be
    identical."""
    X, y = _make_data(400, 6, seed=1)
    common = dict(n_rounds=10, learning_rate=0.1, subsample=1.0,
                  colsample_bytree=1.0, min_child_weight=1.0,
                  reg_alpha=0.1, reg_lambda=1.0, n_bins=64)
    D = 3
    dw = train_gbdt(X, y, GBDTParams(max_depth=D, **common))
    lg = train_gbdt(X, y, GBDTParams(max_depth=D, grow_policy="lossguide",
                                     max_leaves=2 ** D, **common))
    assert isinstance(lg.forest, LGForest)
    a = np.asarray(predict_margin(dw, X, n_trees=10))
    b = np.asarray(predict_margin(lg, X, n_trees=10))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_max_leaves_respected():
    X, y = _make_data(600, 8, seed=2)
    L = 5
    model = train_gbdt(X, y, GBDTParams(
        n_rounds=5, max_depth=12, grow_policy="lossguide", max_leaves=L,
        learning_rate=0.2, subsample=1.0, colsample_bytree=1.0,
        min_child_weight=1.0))
    is_leaf = np.asarray(model.forest.is_leaf)
    lv = np.asarray(model.forest.leaf_value)
    for r in range(5):
        # allocated leaves = nodes carrying value
        assert (lv[r] != 0).sum() <= L
        # internal nodes = leaves - 1 at most
        assert (~is_leaf[r]).sum() <= L - 1


def test_lossguide_learns_and_early_stops():
    X, y = _make_data(700, 8, seed=3)
    Xt, yt, Xv, yv = X[:500], y[:500], X[500:], y[500:]
    model = train_gbdt(
        Xt, yt,
        GBDTParams(n_rounds=120, max_depth=6, grow_policy="lossguide",
                   max_leaves=15, learning_rate=0.2,
                   subsample=0.9, colsample_bytree=0.9),
        X_val=Xv, y_val=yv, early_stopping_rounds=25)
    assert model.best_iteration >= 0
    p = np.asarray(predict_proba(model, Xv))
    assert ((p > 0.5) == yv).mean() > 0.85


def test_lossguide_deeper_than_depthwise_on_chain():
    """A chain-structured signal (XOR of 4 features) needs depth; a
    15-leaf lossguide tree at depth cap 8 must beat a depth-3 tree."""
    rng = np.random.default_rng(4)
    n = 1500
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0) ^ (X[:, 2] > 0)).astype(np.float32)
    common = dict(n_rounds=60, learning_rate=0.3, subsample=1.0,
                  colsample_bytree=1.0, min_child_weight=1.0)
    lg = train_gbdt(X, y, GBDTParams(max_depth=8, grow_policy="lossguide",
                                     max_leaves=15, **common))
    acc = ((np.asarray(predict_proba(lg, X, n_trees=60)) > 0.5) == y).mean()
    assert acc > 0.9, acc


def test_lossguide_dart_runs():
    X, y = _make_data(400, 6, seed=5)
    m = train_gbdt(X[:300], y[:300],
                   GBDTParams(n_rounds=40, max_depth=6, max_leaves=8,
                              grow_policy="lossguide", learning_rate=0.3,
                              dart_rate=0.15),
                   X_val=X[300:], y_val=y[300:], early_stopping_rounds=20)
    assert np.isfinite(np.asarray(m.eval_history)).all()
    p = np.asarray(predict_proba(m, X[300:]))
    assert ((p > 0.5) == y[300:]).mean() > 0.7


def test_lossguide_sharded_matches_single_device():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.mesh import make_mesh
    from mallorn_tpu.parallel.sharded_train import train_gbdt_sharded

    X, y = _make_data(320, 6, seed=6)
    params = GBDTParams(n_rounds=10, max_depth=6, grow_policy="lossguide",
                        max_leaves=10, learning_rate=0.2, subsample=0.8,
                        colsample_bytree=0.8)
    single = train_gbdt(X, y, params)
    sharded = train_gbdt_sharded(make_mesh(8), X, y, params)
    np.testing.assert_array_equal(np.asarray(single.forest.feature),
                                  np.asarray(sharded.forest.feature))
    np.testing.assert_array_equal(np.asarray(single.forest.left),
                                  np.asarray(sharded.forest.left))
    np.testing.assert_allclose(np.asarray(single.forest.leaf_value),
                               np.asarray(sharded.forest.leaf_value),
                               rtol=2e-4, atol=2e-5)
