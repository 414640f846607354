"""GBDT: exact parity vs the loop-based NumPy oracle + functional checks."""

import numpy as np
import pytest

from mallorn_tpu.trees import (BinSpec, GBDTParams, apply_bins, fit_bins,
                               predict_margin, predict_proba, train_gbdt)
from mallorn_tpu.trees import objectives


def _make_data(n=400, f=8, seed=0, nan_frac=0.15):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    logit = 1.5 * X[:, 0] - 2.0 * X[:, 1] + X[:, 2] * X[:, 3]
    y = (logit + rng.normal(scale=0.5, size=n) > 0).astype(np.float32)
    # informative missingness on feature 4
    nan_mask = rng.uniform(size=n) < nan_frac + 0.2 * y
    X[nan_mask, 4] = np.nan
    return X, y


def test_matches_numpy_oracle():
    from tests.oracles.gbdt_oracle import OracleGBDT

    X, y = _make_data(300, 6, seed=3)
    params = GBDTParams(n_rounds=15, max_depth=3, learning_rate=0.1,
                        subsample=1.0, colsample_bytree=1.0,
                        min_child_weight=3.0, reg_alpha=0.2, reg_lambda=1.5,
                        n_bins=64)
    w = np.ones_like(y)

    model = train_gbdt(X, y, params, sample_weight=w)
    ours = np.asarray(predict_margin(model, X, n_trees=params.n_rounds))

    spec = fit_bins(X, 64)
    binned = np.asarray(apply_bins(spec, X))
    oracle = OracleGBDT(n_rounds=15, max_depth=3, learning_rate=0.1,
                        reg_alpha=0.2, reg_lambda=1.5, min_child_weight=3.0,
                        n_bins=64)
    oracle.fit(binned, y.astype(np.float64), w.astype(np.float64))
    want = oracle.predict_margin(binned)

    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_learns_separable():
    X, y = _make_data(800, 8, seed=1)
    model = train_gbdt(X, y, GBDTParams(n_rounds=150, max_depth=4,
                                        learning_rate=0.1))
    p = np.asarray(predict_proba(model, X, n_trees=150))
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.93, acc


def test_early_stopping_and_history():
    X, y = _make_data(600, 8, seed=2)
    Xt, yt, Xv, yv = X[:400], y[:400], X[400:], y[400:]
    model = train_gbdt(Xt, yt,
                       GBDTParams(n_rounds=200, max_depth=4, learning_rate=0.3),
                       X_val=Xv, y_val=yv, early_stopping_rounds=20)
    h = np.asarray(model.eval_history)
    assert model.best_iteration >= 0
    # device-side early stopping: the while_loop stops ~patience rounds
    # past the best, leaving +inf for unexecuted rounds (and zero trees,
    # inert in prediction)
    executed = np.isfinite(h)
    n_exec = int(executed.sum())
    assert executed[:n_exec].all(), "executed rounds must be a prefix"
    assert model.best_iteration + 21 >= n_exec or n_exec == len(h)
    assert n_exec < len(h), "this config stops well before 200 rounds"
    assert h[model.best_iteration] <= h[0]
    # best under the walk-forward rule is a prefix argmin
    assert h[model.best_iteration] == h[: model.best_iteration + 21].min()
    # trees beyond the stop are inert zeros
    lv = np.asarray(model.forest.leaf_value)
    assert (lv[n_exec:] == 0).all()


def test_nan_default_direction_learned():
    rng = np.random.default_rng(5)
    n = 600
    y = rng.integers(0, 2, n).astype(np.float32)
    X = rng.normal(size=(n, 3)).astype(np.float32)
    # feature 0: NaN iff label 1 (pure missingness signal)
    X[y == 1, 0] = np.nan
    model = train_gbdt(X, y, GBDTParams(n_rounds=30, max_depth=2,
                                        learning_rate=0.3, subsample=1.0,
                                        colsample_bytree=1.0,
                                        min_child_weight=0.0))
    p = np.asarray(predict_proba(model, X, n_trees=30))
    assert ((p > 0.5) == y).mean() > 0.99


def test_scale_pos_weight_shifts_up():
    X, y = _make_data(500, 8, seed=4)
    m1 = train_gbdt(X, y, GBDTParams(n_rounds=50))
    m2 = train_gbdt(X, y, GBDTParams(n_rounds=50), scale_pos_weight=5.0)
    p1 = np.asarray(predict_proba(m1, X, n_trees=50)).mean()
    p2 = np.asarray(predict_proba(m2, X, n_trees=50)).mean()
    assert p2 > p1


def test_focal_objective_runs():
    X, y = _make_data(400, 6, seed=6)
    obj = objectives.make_focal(gamma=2.0, alpha=0.85)
    model = train_gbdt(X, y, GBDTParams(n_rounds=40, learning_rate=0.1),
                       objective=obj)
    p = np.asarray(predict_proba(model, X, n_trees=40))
    assert ((p > 0.5) == y).mean() > 0.8


def test_importance_finds_signal_features():
    X, y = _make_data(800, 8, seed=7)
    model = train_gbdt(X, y, GBDTParams(n_rounds=60, subsample=1.0,
                                        colsample_bytree=1.0))
    imp = np.asarray(model.importance_gain)
    # features 0 and 1 carry the linear signal
    assert set(np.argsort(imp)[-3:]) & {0, 1}


def test_dart_mode():
    X, y = _make_data(500, 8, seed=9)
    m = train_gbdt(X[:400], y[:400],
                   GBDTParams(n_rounds=60, max_depth=4, learning_rate=0.2,
                              dart_rate=0.15),
                   X_val=X[400:], y_val=y[400:], early_stopping_rounds=30)
    p = np.asarray(predict_proba(m, X[400:]))
    assert ((p > 0.5) == y[400:]).mean() > 0.75
    assert np.isfinite(np.asarray(m.eval_history)).all()


def test_val_margin_from_fit_equals_predict():
    """The fit-tracked best-iteration val margins (GBDTModel.val_margin)
    must equal an explicit predict at best_iteration — including folds
    whose metric dips again AFTER their early stop (the device loop must
    freeze best tracking at the host scan's first-stop point)."""
    from mallorn_tpu.trees.gbdt import (predict_margin, predict_margin_folds,
                                        train_gbdt, train_gbdt_folds)

    for seed in (0, 1, 2):
        X, y = _make_data(700, 8, seed=seed)
        Xf, yf, Xv, yv = X[:550], y[:550], X[550:], y[550:]
        p = GBDTParams(n_rounds=80, max_depth=4, learning_rate=0.15,
                       seed=seed)
        m = train_gbdt(Xf, yf, p, X_val=Xv, y_val=yv,
                       early_stopping_rounds=8)
        assert m.val_margin is not None
        want = np.asarray(predict_margin(m, Xv))
        np.testing.assert_allclose(m.val_margin, want, rtol=0, atol=1e-5)

    # fold-vmapped path: ragged folds, frozen-after-stop semantics
    X, y = _make_data(900, 8, seed=7)
    folds = []
    for i, (a, b) in enumerate(((0, 600), (100, 700), (250, 850))):
        folds.append({"X": X[a:b], "y": y[a:b],
                      "X_val": X[b:b + 50 + 10 * i], "y_val": y[b:b + 50 + 10 * i],
                      "spw": 1.0})
    models = train_gbdt_folds(folds, GBDTParams(n_rounds=60, max_depth=4,
                                                learning_rate=0.2),
                              early_stopping_rounds=5)
    got = predict_margin_folds(models, [f["X_val"] for f in folds])
    for i, m in enumerate(models):
        assert m.val_margin is not None
        nv = len(folds[i]["X_val"])
        np.testing.assert_allclose(m.val_margin[:nv], got[i][:nv],
                                   rtol=0, atol=1e-5)


def _make_mc_data(n=300, f=6, n_class=4, seed=11):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    W = rng.normal(size=(f, n_class))
    logits = X @ W + rng.normal(scale=0.5, size=(n, n_class))
    y = np.argmax(logits, axis=1).astype(np.float32)
    X[rng.uniform(size=n) < 0.1, 2] = np.nan
    return X, y


def test_multiclass_matches_numpy_oracle():
    """multi:softprob exact parity vs the loop-NumPy oracle (reference v62
    semantics: scripts/train_v62_multiclass_ensemble.py:176-177)."""
    from mallorn_tpu.trees import apply_bins, fit_bins
    from tests.oracles.gbdt_oracle import OracleMulticlassGBDT

    X, y = _make_mc_data(250, 6, n_class=4, seed=5)
    params = GBDTParams(n_rounds=8, max_depth=3, learning_rate=0.1,
                        subsample=1.0, colsample_bytree=1.0,
                        min_child_weight=1.0, reg_alpha=0.1, reg_lambda=1.0,
                        n_bins=64, num_class=4)
    model = train_gbdt(X, y, params, scale_pos_weight=1.0)
    ours = np.asarray(predict_margin(model, X, n_trees=params.n_rounds))

    spec = fit_bins(X, 64)
    binned = np.asarray(apply_bins(spec, X))
    oracle = OracleMulticlassGBDT(n_class=4, n_rounds=8, max_depth=3,
                                  learning_rate=0.1, reg_alpha=0.1,
                                  reg_lambda=1.0, min_child_weight=1.0,
                                  n_bins=64)
    oracle.fit(binned, y, np.ones(len(y)))
    want = oracle.predict_margin(binned)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_multiclass_learns_and_probs_normalize():
    X, y = _make_mc_data(600, 6, n_class=3, seed=9)
    params = GBDTParams(n_rounds=60, max_depth=4, learning_rate=0.15,
                        num_class=3)
    model = train_gbdt(X, y, params, scale_pos_weight=1.0)
    p = np.asarray(predict_proba(model, X))
    assert p.shape == (600, 3)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)
    assert (p.argmax(axis=1) == y).mean() > 0.85


def test_multiclass_early_stopping_mlogloss():
    X, y = _make_mc_data(700, 6, n_class=4, seed=13)
    Xt, yt, Xv, yv = X[:500], y[:500], X[500:], y[500:]
    params = GBDTParams(n_rounds=120, max_depth=4, learning_rate=0.3,
                        num_class=4)
    m = train_gbdt(Xt, yt, params, scale_pos_weight=1.0, X_val=Xv, y_val=yv,
                   early_stopping_rounds=10)
    assert m.best_iteration >= 0
    h = np.asarray(m.eval_history)
    assert np.isfinite(h[: m.best_iteration + 1]).all()
    # fit-tracked val margins equal an explicit best-iteration predict
    if m.val_margin is not None:
        want = np.asarray(predict_margin(m, Xv))  # [Nv, K]
        np.testing.assert_allclose(m.val_margin.T[: len(Xv)], want,
                                   rtol=0, atol=1e-5)


def test_squarederror_matches_numpy_oracle():
    """reg:squarederror parity vs the loop oracle (the soft-label trainers'
    objective, reference train_v102_label_smoothing.py:113-137)."""
    from mallorn_tpu.trees import apply_bins, fit_bins
    from tests.oracles.gbdt_oracle import OracleRegressionGBDT

    X, y = _make_data(300, 6, seed=21)
    y_soft = np.where(y == 1, 0.9, 0.1).astype(np.float32)  # eps=0.1 smooth
    params = GBDTParams(n_rounds=12, max_depth=3, learning_rate=0.1,
                        subsample=1.0, colsample_bytree=1.0,
                        min_child_weight=1.0, reg_alpha=0.1, reg_lambda=1.0,
                        n_bins=64, base_score=0.5, eval_metric="rmse")
    model = train_gbdt(X, y_soft, params, scale_pos_weight=1.0,
                       objective=objectives.squarederror)
    ours = np.asarray(predict_margin(model, X, n_trees=params.n_rounds))

    spec = fit_bins(X, 64)
    binned = np.asarray(apply_bins(spec, X))
    oracle = OracleRegressionGBDT(base_score=0.5, n_rounds=12, max_depth=3,
                                  learning_rate=0.1, reg_alpha=0.1,
                                  reg_lambda=1.0, min_child_weight=1.0,
                                  n_bins=64)
    oracle.fit(binned, y_soft.astype(np.float64), np.ones(len(y)))
    want = oracle.predict_margin(binned)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_squarederror_early_stop_rmse():
    X, y = _make_data(600, 8, seed=23)
    y_soft = np.where(y == 1, 0.95, 0.05).astype(np.float32)
    Xt, yt, Xv, yv = X[:450], y_soft[:450], X[450:], y_soft[450:]
    params = GBDTParams(n_rounds=150, max_depth=4, learning_rate=0.2,
                        base_score=0.5, eval_metric="rmse")
    m = train_gbdt(Xt, yt, params, scale_pos_weight=1.0,
                   objective=objectives.squarederror,
                   X_val=Xv, y_val=yv, early_stopping_rounds=15)
    assert m.best_iteration >= 0
    pred = np.asarray(predict_margin(m, Xv))
    rmse = float(np.sqrt(np.mean((pred - yv) ** 2)))
    assert rmse < 0.3, rmse
