"""Ordered target encoding (CatBoost core statistic) + TPE HPO sampler."""

import numpy as np
import pytest

from mallorn_tpu.features.categorical import ordered_target_encoding


def _slow_ordered_encode(cat, y, perm, prior, w):
    """Oracle: literal per-row loop over one permutation."""
    n = len(cat)
    pos = np.empty(n, np.int64)
    pos[perm] = np.arange(n)
    enc = np.zeros(n)
    for i in range(n):
        prev = (cat == cat[i]) & (pos < pos[i])
        enc[i] = (y[prev].sum() + prior * w) / (prev.sum() + w)
    return enc


def test_ordered_encoding_matches_loop_oracle():
    rng = np.random.default_rng(0)
    n = 200
    cat = rng.integers(0, 5, n)
    y = rng.integers(0, 2, n).astype(float)
    prior = y.mean()

    got, _ = ordered_target_encoding(cat, y, n_permutations=1, seed=7)
    perm = np.random.default_rng(7).permutation(n)
    want = _slow_ordered_encode(cat, y, perm, prior, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ordered_encoding_no_target_leak():
    """A category perfectly aligned with the target must NOT encode to the
    target itself (leak-free: the first occurrence sees only the prior)."""
    rng = np.random.default_rng(1)
    n = 400
    y = rng.integers(0, 2, n).astype(float)
    cat = y.astype(int)  # cat == target: maximal leak risk
    enc, _ = ordered_target_encoding(cat, y, n_permutations=4)
    # leak-free encoding correlates with y but never equals it exactly
    assert 0 < np.corrcoef(enc, y)[0, 1] < 1
    assert not np.allclose(enc, y)


def test_test_split_uses_full_stats():
    cat = np.array([0, 0, 0, 1, 1])
    y = np.array([1.0, 1, 1, 0, 0])
    _, enc_te = ordered_target_encoding(cat, y, cat_test=np.array([0, 1, 9]))
    prior = y.mean()
    np.testing.assert_allclose(enc_te[0], (3 + prior) / 4)
    np.testing.assert_allclose(enc_te[1], (0 + prior) / 3)
    np.testing.assert_allclose(enc_te[2], prior)  # unseen category -> prior


def test_tpe_proposals_concentrate(monkeypatch):
    """The TPE mechanism: post-startup proposals (sampled from the
    good-side Parzen model) must average better objective values than the
    random startup trials on a smooth toy objective."""
    from mallorn_tpu.train import hpo

    target = {"learning_rate": 0.05, "subsample": 0.8, "max_depth": 5,
              "colsample_bytree": 0.85, "min_child_weight": 4.0,
              "reg_alpha": 0.3, "reg_lambda": 2.0}
    seen = []

    def fake_cv(X, y, Xt, params, sample_weight=None, **kw):
        import types

        score = -sum(
            (np.log(getattr(params, k)) - np.log(v)) ** 2 if k == "learning_rate"
            else ((getattr(params, k) - v) / (abs(v) + 1)) ** 2
            for k, v in target.items())
        seen.append(float(np.exp(score)))
        return types.SimpleNamespace(best_f1=seen[-1], best_threshold=0.3)

    monkeypatch.setattr(hpo, "train_cv", fake_cv)
    X = np.zeros((10, 2)); y = np.zeros(10)
    n_startup = 8
    tpe = hpo.tpe_search(X, y, n_trials=28, n_startup=n_startup, seed=3)
    startup, guided = seen[:n_startup], seen[n_startup:]
    assert np.mean(guided) > np.mean(startup), (np.mean(guided),
                                                np.mean(startup))
    assert tpe[0].oof_f1 >= max(startup)  # never worse than the warmup
