"""CatBoost-family symmetric (oblivious) trees + v119 stacking.

Reference: scripts/train_v118_catboost.py:5-7 (symmetric trees are
CatBoost's tree builder), scripts/train_v119_stacking.py:33,139-163
(logistic-regression meta-learner on OOF prediction columns + mean/std
agreement features).
"""

import numpy as np
import pytest

from mallorn_tpu.train import ensembles
from mallorn_tpu.trees.gbdt import GBDTParams, predict_proba, train_gbdt


def _data(n=400, d=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    logit = 1.4 * X[:, 0] - 1.1 * X[:, 1] + 0.7 * X[:, 2] * X[:, 3]
    y = (logit + rng.normal(0, 0.5, n) > 0.3).astype(np.float32)
    return X, y


def test_symmetric_trees_are_oblivious():
    """Every level of every tree shares one (feature, bin, direction)."""
    X, y = _data()
    p = GBDTParams(n_rounds=10, max_depth=4, learning_rate=0.2,
                   grow_policy="symmetric", subsample=1.0,
                   colsample_bytree=1.0)
    model = train_gbdt(X, y, p)
    feat = np.asarray(model.forest.feature)  # [R, I]
    sbin = np.asarray(model.forest.split_bin)
    dl = np.asarray(model.forest.default_left)
    leaf = np.asarray(model.forest.is_leaf)
    for r in range(feat.shape[0]):
        for d in range(p.max_depth):
            lo, hi = 2 ** d - 1, 2 ** (d + 1) - 1
            if leaf[r, lo:hi].all():
                continue
            assert len(np.unique(feat[r, lo:hi])) == 1, (r, d)
            assert len(np.unique(sbin[r, lo:hi])) == 1, (r, d)
            assert len(np.unique(dl[r, lo:hi])) == 1, (r, d)
            # oblivious: the whole level splits together
            assert not leaf[r, lo:hi].any(), (r, d)


def test_symmetric_trees_learn():
    X, y = _data(seed=3)
    p = GBDTParams(n_rounds=60, max_depth=4, learning_rate=0.15,
                   grow_policy="symmetric")
    model = train_gbdt(X, y, p)
    preds = np.asarray(predict_proba(model, X))
    acc = ((preds > 0.5) == (y > 0.5)).mean()
    assert acc > 0.85, acc


def test_symmetric_differs_from_depthwise_but_comparable():
    """Oblivious trees are a different model family (ensemble diversity is
    the reference's entire reason for CatBoost, train_v118_catboost.py:5-11)
    yet should reach comparable accuracy on an easy task."""
    X, y = _data(seed=5)
    Xt, yt = _data(seed=99)
    base = dict(n_rounds=40, max_depth=4, learning_rate=0.15)
    m_sym = train_gbdt(X, y, GBDTParams(grow_policy="symmetric", **base))
    m_dw = train_gbdt(X, y, GBDTParams(grow_policy="depthwise", **base))
    p_sym = np.asarray(predict_proba(m_sym, Xt))
    p_dw = np.asarray(predict_proba(m_dw, Xt))
    assert not np.allclose(p_sym, p_dw)  # genuinely different models
    acc_sym = ((p_sym > 0.5) == (yt > 0.5)).mean()
    acc_dw = ((p_dw > 0.5) == (yt > 0.5)).mean()
    assert acc_sym > acc_dw - 0.08, (acc_sym, acc_dw)


def test_logreg_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.linear_model")
    rng = np.random.default_rng(1)
    X = rng.normal(size=(300, 4))
    y = (X @ np.array([1.0, -2.0, 0.5, 0.0]) + rng.normal(0, 0.5, 300)
         > 0).astype(np.float64)
    w = ensembles._logreg_fit(X, y, l2=1.0)
    ref = sklearn.LogisticRegression(C=1.0, solver="lbfgs", max_iter=2000)
    ref.fit(X, y)
    np.testing.assert_allclose(w[:-1], ref.coef_[0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(w[-1], ref.intercept_[0], rtol=2e-3, atol=2e-3)


def test_stacking_combines_complementary_models():
    """Two base models each see half the signal; the stack should beat
    both (the v119 premise)."""
    rng = np.random.default_rng(7)
    n = 1200
    s1 = rng.normal(size=n)
    s2 = rng.normal(size=n)
    y = ((s1 + s2) > 0.5).astype(np.float64)

    def noisy_prob(signal, noise):
        return 1 / (1 + np.exp(-(signal + rng.normal(0, noise, n))))

    oof = [noisy_prob(s1, 0.7), noisy_prob(s2, 0.7)]
    test = [o.copy() for o in oof]
    out = ensembles.stack_oof(oof, y, test_preds=test)
    assert out["test_preds"].shape == (n,)
    assert np.all((out["oof_preds"] >= 0) & (out["oof_preds"] <= 1))

    from sklearn.metrics import f1_score

    single = max(
        max(f1_score(y, (o > t).astype(int))
            for t in np.linspace(0.05, 0.95, 50))
        for o in oof)
    assert out["best_f1"] > single + 0.02, (out["best_f1"], single)


def test_stacking_without_test_preds():
    rng = np.random.default_rng(11)
    y = (rng.normal(size=200) > 0).astype(np.float64)
    oof = [np.clip(y * 0.6 + rng.uniform(0, 0.4, 200), 0, 1)]
    out = ensembles.stack_oof(oof, y)
    assert out["test_preds"] is None
    assert 0 < out["best_f1"] <= 1
