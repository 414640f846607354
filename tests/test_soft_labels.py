"""Soft-label trainers (v102 label smoothing, v97 soft pseudo, v108
distillation) and the v62 multiclass pipeline.

Reference semantics: all three soft-label scripts train XGBoost
REGRESSION (reg:squarederror) on float targets and evaluate OOF F1 on the
hard labels (reference: non_successful_tests/scripts/
train_v102_label_smoothing.py:113-137, train_v97_soft_pseudo.py:122-230,
train_v108_knowledge_distillation.py:150-241); v62 trains a 4-class
multi:softprob head whose class probabilities feed the final binary
classifier (reference: scripts/train_v62_multiclass_ensemble.py).
"""

import numpy as np
import pytest

from mallorn_tpu.train import pipelines
from mallorn_tpu.train.cv import train_cv, train_cv_multiclass
from mallorn_tpu.trees.gbdt import GBDTParams

SOFT_PARAMS = pipelines.SOFT_LABEL_PARAMS._replace(n_rounds=60)


def _binary_data(n=400, f=10, seed=0, pos_frac=0.15):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    logit = 2.0 * X[:, 0] - 1.5 * X[:, 1] + X[:, 2]
    thresh = np.quantile(logit, 1 - pos_frac)
    y = (logit + rng.normal(scale=0.4, size=n) > thresh).astype(np.float32)
    X[rng.uniform(size=n) < 0.1, 3] = np.nan
    return X, y


def test_label_smoothing_bounds_and_f1():
    """Smoothed-regression predictions concentrate inside the eps band
    and the hard-label OOF F1 stays competitive."""
    X, y = _binary_data(500, 8, seed=1)
    cv = pipelines.run_label_smoothing(X, y, epsilon=0.10,
                                       params=SOFT_PARAMS)
    # regression toward targets in [0.1, 0.9]: the bulk of predictions
    # must live near the band (boosting can overshoot slightly)
    assert np.isfinite(cv.oof_preds).all()
    assert (cv.oof_preds > -0.25).all() and (cv.oof_preds < 1.25).all()
    assert cv.best_f1 > 0.5, cv.best_f1
    # stronger smoothing pulls the positive-class predictions DOWN toward
    # 1-eps: mean prediction on true positives under eps=.3 < under eps=.01
    cv_light = pipelines.run_label_smoothing(X, y, epsilon=0.01,
                                             params=SOFT_PARAMS)
    cv_heavy = pipelines.run_label_smoothing(X, y, epsilon=0.30,
                                             params=SOFT_PARAMS)
    assert (cv_heavy.oof_preds[y == 1].mean()
            < cv_light.oof_preds[y == 1].mean())


def test_distillation_blends_teacher():
    X, y = _binary_data(500, 8, seed=2)
    teacher = train_cv(X, y, None, GBDTParams(n_rounds=60, max_depth=4,
                                              learning_rate=0.1))
    cv = pipelines.run_distillation(X, y, teacher.oof_preds,
                                    alpha=0.5, temperature=1.0,
                                    params=SOFT_PARAMS)
    assert np.isfinite(cv.oof_preds).all()
    assert cv.best_f1 > 0.5, cv.best_f1
    # alpha controls how much of the teacher's scale survives: with a
    # synthetic teacher shrunk to [0.25, 0.75], the alpha=0 student's
    # negative-class predictions regress toward 0.25 while alpha=1's
    # regress toward 0 (the majority class, where the fit is tightest)
    shrunk_teacher = 0.25 + 0.5 * y
    cv_soft = pipelines.run_distillation(X, y, shrunk_teacher,
                                         alpha=0.0, params=SOFT_PARAMS)
    cv_hard = pipelines.run_distillation(X, y, shrunk_teacher,
                                         alpha=1.0, params=SOFT_PARAMS)
    assert (cv_soft.oof_preds[y == 0].mean()
            > cv_hard.oof_preds[y == 0].mean() + 0.1)


def test_temperature_scale_identity_and_softening():
    p = np.array([0.1, 0.3, 0.7, 0.9])
    np.testing.assert_allclose(pipelines.temperature_scale(p, 1.0), p,
                               atol=1e-9)
    soft = pipelines.temperature_scale(p, 2.0)
    # higher T pulls everything toward 0.5
    assert (np.abs(soft - 0.5) < np.abs(p - 0.5)).all()


def test_soft_pseudo_adds_confident_rows():
    X, y = _binary_data(400, 8, seed=3)
    Xte, yte = _binary_data(300, 8, seed=4)
    base = train_cv(X, y, Xte, GBDTParams(n_rounds=60, max_depth=4,
                                          learning_rate=0.1))
    cv = pipelines.run_soft_pseudo(X, y, Xte, base.test_preds,
                                   threshold=0.9, params=SOFT_PARAMS,
                                   verbose=True)
    assert np.isfinite(cv.oof_preds).all()
    assert cv.best_f1 > 0.5, cv.best_f1
    # v97d variant: teacher probabilities as the soft targets
    cv_d = pipelines.run_soft_pseudo(X, y, Xte, base.test_preds,
                                     threshold=0.9, use_actual_probs=True,
                                     params=SOFT_PARAMS)
    assert np.isfinite(cv_d.oof_preds).all()


def _mc_data(n=400, f=8, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    W = rng.normal(size=(f, 4))
    logits = X @ W * 1.5
    y_mc = np.argmax(logits + rng.normal(scale=0.3, size=(n, 4)), axis=1)
    return X, y_mc


def test_train_cv_multiclass_probs_and_accuracy():
    X, y_mc = _mc_data(500)
    oof, test_probs, models = train_cv_multiclass(
        X, y_mc, X[:100],
        GBDTParams(n_rounds=60, max_depth=4, learning_rate=0.15,
                   num_class=4))
    assert oof.shape == (500, 4)
    np.testing.assert_allclose(oof.sum(axis=1), 1.0, atol=1e-5)
    assert (oof.argmax(axis=1) == y_mc).mean() > 0.7
    assert test_probs.shape == (100, 4)
    np.testing.assert_allclose(test_probs.sum(axis=1), 1.0, atol=1e-5)
    assert len(models) == 5


def test_run_v62_end_to_end():
    rng = np.random.default_rng(11)
    n = 400
    X = rng.normal(size=(n, 10)).astype(np.float32)
    # class structure driven by the first features
    logits = np.column_stack([
        2.0 * X[:, 0], 2.0 * X[:, 1], 2.0 * X[:, 2],
        2.0 * X[:, 3]]) + rng.normal(scale=0.5, size=(n, 4))
    cls = np.argmax(logits, axis=1)
    spec = np.array(["TDE", "AGN", "SN Ia", "SN II"])[cls]
    y_bin = (cls == 0).astype(np.float32)

    out = pipelines.run_v62(
        X, y_bin, spec, [f"f{i}" for i in range(10)],
        mc_params=pipelines.V62_MC_PARAMS._replace(n_rounds=40),
        params=pipelines.V34A_PARAMS._replace(n_rounds=40))
    assert out.mc_oof.shape == (n, 4)
    assert sorted(out.mc_classes) == ["AGN", "SN_CC", "SN_Ia", "TDE"]
    assert out.feature_names[-6:] == [
        "mc_prob_tde", "mc_prob_agn", "mc_prob_sn_ia", "mc_prob_sn_cc",
        "mc_ratio_tde_agn", "mc_ratio_tde_sn_ia"]
    assert np.isfinite(out.oof_f1) and out.oof_f1 > 0.5
    assert np.isfinite(out.mc_tde_f1) and out.mc_tde_f1 > 0.5
