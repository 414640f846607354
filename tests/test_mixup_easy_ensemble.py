"""v106 MixUp and v93 EasyEnsemble trainer semantics.

Reference: non_successful_tests/scripts/train_v106_mixup.py (Beta-lambda
row mixing within each fold's training rows, regression on soft labels,
validation on originals) and train_v93_easy_ensemble.py (N models on
balanced undersampled subsets, averaged predictions).
"""

import numpy as np
import pytest

from mallorn_tpu.train import pipelines
from mallorn_tpu.train.cv import train_cv
from mallorn_tpu.train.pipelines import (mixup_matrix, run_easy_ensemble,
                                         run_mixup)
from mallorn_tpu.trees.gbdt import GBDTParams

SMALL = GBDTParams(n_rounds=15, max_depth=3, learning_rate=0.2,
                   subsample=1.0, colsample_bytree=1.0)
SMALL_SOFT = SMALL._replace(base_score=0.5, eval_metric="rmse")


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(3)
    n, f = 240, 8
    X = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=f)
    margin = X @ w - 1.2
    y = (margin + rng.normal(scale=0.5, size=n) > 0).astype(np.int32)
    if y.sum() < 20:  # keep a usable minority
        y[np.argsort(margin)[-20:]] = 1
    return X, y


def test_mixup_matrix_semantics():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 5)).astype(np.float32)
    y = (rng.uniform(size=64) > 0.8).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=64).astype(np.float32)

    Xm, ym, wm = mixup_matrix(X, y, w, alpha=1.0, seed=7)
    # reference :148-150 folds lambda to >= 0.5 so the original sample
    # dominates: every mixed row is at least as close to its original as
    # to its partner
    assert Xm.shape == X.shape and ym.shape == y.shape
    assert np.all(ym >= 0.0) and np.all(ym <= 1.0)
    d_orig = np.linalg.norm(Xm - X, axis=1)
    # lam >= 0.5 -> |mix - orig| = (1-lam)|x_i - x_j| <= lam|x_i - x_j|
    # = |mix - partner|; verify through the label identity instead of
    # recovering the permutation: a mixed label is within 0.5 of its
    # original hard label
    assert np.all(np.abs(ym - y) <= 0.5 + 1e-6)
    # weights: geometric mean of a positive pair stays within the pair's
    # range
    assert np.all(wm >= w.min() - 1e-6) and np.all(wm <= w.max() + 1e-6)
    # deterministic
    Xm2, ym2, _ = mixup_matrix(X, y, w, alpha=1.0, seed=7)
    np.testing.assert_array_equal(Xm, Xm2)
    np.testing.assert_array_equal(ym, ym2)
    # NaN cells poison their mixes only where the lambda weight is
    # nonzero (reference float arithmetic)
    Xn = X.copy()
    Xn[0, 0] = np.nan
    Xm3, _, _ = mixup_matrix(Xn, y, w, alpha=1.0, seed=7)
    assert np.isnan(Xm3[0, 0])


def test_train_transform_identity_is_noop(toy):
    """An identity train_transform reproduces the untransformed CV run
    exactly (per-fold binning equals the shared-sort shortcut)."""
    X, y = toy
    base = train_cv(X, y, None, SMALL, seed=11)
    ident = train_cv(X, y, None, SMALL, seed=11,
                     train_transform=lambda Xf, yf, wf, k: (Xf, yf, wf))
    np.testing.assert_allclose(ident.oof_preds, base.oof_preds,
                               rtol=0, atol=1e-6)
    assert ident.best_f1 == pytest.approx(base.best_f1, abs=1e-12)


def test_run_mixup_end_to_end(toy):
    X, y = toy
    cv = run_mixup(X, y, X[:50], alpha=0.4, seeds=(5, 6),
                   params=SMALL_SOFT)
    assert cv.oof_preds.shape == (len(y),)
    assert cv.test_preds.shape == (50,)
    assert np.all(cv.oof_preds >= 0.0) and np.all(cv.oof_preds <= 1.0)
    assert np.all(np.isfinite(cv.test_preds))
    assert len(cv.fold_f1s) == 2  # per-seed F1s
    assert 0.0 <= cv.best_f1 <= 1.0
    # the augmentation must actually change the fit vs plain soft
    # regression on hard labels
    import mallorn_tpu.trees.objectives as objectives

    plain = train_cv(X, y.astype(np.float32), X[:50], SMALL_SOFT,
                     use_scale_pos_weight=False,
                     objective=objectives.squarederror,
                     sigmoid_outputs=False, seed=5)
    assert not np.allclose(cv.test_preds, np.clip(plain.test_preds, 0, 1))


def test_run_easy_ensemble(toy):
    X, y = toy
    cv = run_easy_ensemble(X, y, X[:40], n_estimators=4,
                           undersample_ratio=1.0, params=SMALL, seed=3)
    assert cv.oof_preds.shape == (len(y),)
    assert cv.test_preds.shape == (40,)
    assert np.all(cv.oof_preds > 0.0) and np.all(cv.oof_preds < 1.0)
    assert len(cv.models) == 4
    # balanced subsets separate the toy classes: in-sample ranking must
    # put positives above negatives on average (AUC well above chance)
    pos = cv.oof_preds[y == 1]
    neg = cv.oof_preds[y == 0]
    auc = (pos[:, None] > neg[None, :]).mean()
    assert auc > 0.8, auc
    # deterministic
    cv2 = run_easy_ensemble(X, y, X[:40], n_estimators=4,
                            undersample_ratio=1.0, params=SMALL, seed=3)
    np.testing.assert_allclose(cv.test_preds, cv2.test_preds, atol=1e-6)


def test_easy_ensemble_ratio_caps_at_majority(toy):
    X, y = toy
    # a huge ratio must clamp to the available majority rows, not raise
    cv = run_easy_ensemble(X, y, None, n_estimators=2,
                           undersample_ratio=1e9, params=SMALL, seed=1)
    assert cv.oof_preds.shape == (len(y),)
