"""v104 seed ensemble: all seeds x folds as one vmapped dispatch
(reference: non_successful_tests/scripts/train_v104_seed_ensemble.py:129-203)."""

import numpy as np
import pytest

from mallorn_tpu.train.cv import train_cv
from mallorn_tpu.train.pipelines import run_seed_ensemble
from mallorn_tpu.trees.gbdt import GBDTParams

PARAMS = GBDTParams(n_rounds=40, max_depth=3, learning_rate=0.15,
                    subsample=0.8, colsample_bytree=0.8)


def _data(n=360, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 10)).astype(np.float32)
    logit = 1.2 * X[:, 0] - 1.5 * X[:, 1] + X[:, 2]
    y = (logit + rng.normal(0, 0.6, n) > 0.8).astype(np.float32)
    Xt = rng.normal(size=(120, 10)).astype(np.float32)
    return X, y, Xt


@pytest.mark.slow
def test_vmapped_matches_sequential_train_cv():
    """The [seeds*folds]-lane path must reproduce per-seed sequential
    train_cv exactly (same splits, same keys, same padding)."""
    X, y, Xt = _data()
    seeds = (42, 123)

    oof, test, f1s = run_seed_ensemble(X, y, Xt, PARAMS, seeds=seeds)

    oofs_ref, tests_ref = [], []
    for seed in seeds:
        # same feature padding the ensemble used across all lanes
        # (PAD_FEATURES: natural width per config since round 2)
        from mallorn_tpu.train.pipelines import PAD_FEATURES

        cv = train_cv(X, y, Xt, PARAMS._replace(seed=seed), seed=seed,
                      pad_features_to=PAD_FEATURES)
        oofs_ref.append(cv.oof_preds)
        tests_ref.append(cv.test_preds)
    np.testing.assert_allclose(oof, np.mean(oofs_ref, 0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(test, np.mean(tests_ref, 0), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_seed_diversity_and_averaging():
    X, y, Xt = _data(seed=1)
    seeds = (1, 2, 3)
    oof, test, f1s = run_seed_ensemble(X, y, Xt, PARAMS, seeds=seeds)
    assert set(f1s) == set(seeds)
    assert np.isfinite(list(f1s.values())).all()
    assert oof.shape == (len(y),) and test.shape == (len(Xt),)
    assert 0 < oof.mean() < 1


def test_grouped_lane_dispatch_bit_identical():
    """The many-lane HBM-budget split (_train_folds_grouped) must produce
    bit-identical models to the single vmapped dispatch — lanes are
    independent, grouping only changes dispatch batching."""
    from mallorn_tpu.trees.gbdt import (_train_folds_grouped,
                                        train_gbdt_folds)

    X, y, _ = _data(n=240)
    rng = np.random.default_rng(3)
    folds = []
    for seed in (7, 8, 9):
        idx = rng.permutation(len(y))
        tr, va = idx[:180], idx[180:]
        folds.append({"X": X[tr], "y": y[tr], "w": None,
                      "X_val": X[va], "y_val": y[va], "spw": 1.0,
                      "seed": seed})
    p = PARAMS._replace(n_rounds=15)
    single = train_gbdt_folds(folds, p, early_stopping_rounds=5)
    grouped = _train_folds_grouped(folds, p, None, 5,
                                   None, None, None, g_cap=2)
    assert len(single) == len(grouped) == 3
    for ms, mg in zip(single, grouped):
        for a, b in zip(ms.forest, mg.forest):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ms.best_iteration == mg.best_iteration
        np.testing.assert_array_equal(ms.eval_history, mg.eval_history)
