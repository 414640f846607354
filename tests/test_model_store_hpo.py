"""Model persistence round-trip, HPO search, SMOTE/ADASYN oversampling."""

import numpy as np
import pytest

from mallorn_tpu.trees.gbdt import GBDTParams, predict_proba, train_gbdt


def _data(n=300, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = ((X[:, 0] - X[:, 1] + rng.normal(0, 0.4, n)) > 0).astype(np.float32)
    return X, y


def test_model_roundtrip(tmp_path):
    from mallorn_tpu.io.model_store import load_model, save_model

    X, y = _data()
    m = train_gbdt(X, y, GBDTParams(n_rounds=25, max_depth=3))
    save_model(tmp_path / "m.npz", m)
    m2 = load_model(tmp_path / "m.npz")
    p1 = np.asarray(predict_proba(m, X, 25))
    p2 = np.asarray(predict_proba(m2, X, 25))
    np.testing.assert_allclose(p1, p2, rtol=1e-6)
    assert m2.params.max_depth == 3


def test_cv_models_roundtrip(tmp_path):
    from mallorn_tpu.io.model_store import load_cv_models, save_cv_models
    from mallorn_tpu.train.cv import train_cv

    X, y = _data(250, 1)
    cv = train_cv(X, y, None, GBDTParams(n_rounds=20, max_depth=3), n_folds=3)
    d = save_cv_models(tmp_path / "cv", cv.models, cv.best_threshold,
                       [f"f{i}" for i in range(6)])
    models, man = load_cv_models(d)
    assert len(models) == 3
    assert man["threshold"] == cv.best_threshold
    assert man["feature_names"] == [f"f{i}" for i in range(6)]


@pytest.mark.slow
def test_random_search_improves_or_matches():
    from mallorn_tpu.train.hpo import random_search

    X, y = _data(400, 2)
    trials = random_search(X, y, n_trials=3, n_rounds=40, seed=1)
    assert len(trials) == 3
    assert trials[0].oof_f1 >= trials[-1].oof_f1
    assert np.isfinite(trials[0].oof_f1)


def test_smote_and_adasyn():
    from mallorn_tpu.train.oversample import adasyn, smote

    rng = np.random.default_rng(3)
    X = rng.normal(size=(120, 4))
    y = np.zeros(120, int)
    y[:10] = 1
    X[y == 1] += 3.0
    X[5, 2] = np.nan  # NaN-robust

    Xs, ys = smote(X, y, ratio=0.5)
    assert ys.sum() == int(0.5 * 110)
    assert len(Xs) == len(ys)
    # synthetics stay near the minority cluster
    new = Xs[len(X):]
    assert np.nanmean(new[:, 0]) > 1.0

    Xa, ya = adasyn(X, y, ratio=0.5)
    assert ya.sum() >= 10
    assert len(Xa) == len(ya)
