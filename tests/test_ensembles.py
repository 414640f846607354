"""Ensembling + two-stage + astromer stub tests."""

import numpy as np
import pytest

from mallorn_tpu.train import ensembles
from mallorn_tpu.trees.gbdt import GBDTParams


def _fake_preds(seed, n=400):
    rng = np.random.default_rng(seed)
    y = (rng.uniform(size=n) < 0.15).astype(int)
    p1 = np.clip(y * 0.6 + rng.normal(0.2, 0.15, n), 0, 1)
    p2 = np.clip(y * 0.5 + rng.normal(0.25, 0.18, n), 0, 1)
    return y, p1, p2


def test_rank_average_bounds_and_order():
    y, p1, p2 = _fake_preds(0)
    r = ensembles.rank_average([p1, p2])
    assert r.min() >= 0 and r.max() <= 1
    # the most confident object under both models ranks on top
    top = np.argmax(p1 + p2)
    assert r[top] > np.median(r)


def test_average_blend_weights():
    y, p1, p2 = _fake_preds(1)
    b = ensembles.average_blend([p1, p2], [3, 1])
    np.testing.assert_allclose(b, (3 * p1 + p2) / 4)


def test_optimize_blend_beats_components():
    from sklearn.metrics import f1_score
    y, p1, p2 = _fake_preds(2)
    w, f1, t = ensembles.optimize_blend_weights([p1, p2], y)
    from mallorn_tpu.train.cv import threshold_sweep
    f1_a, _ = threshold_sweep(y, p1)
    f1_b, _ = threshold_sweep(y, p2)
    assert f1 >= max(f1_a, f1_b) - 1e-9


@pytest.mark.slow
def test_two_stage_runs():
    rng = np.random.default_rng(3)
    n = 400
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = ((X[:, 0] + 0.5 * X[:, 1] + rng.normal(0, 0.4, n)) > 1.2).astype(np.float32)
    fast = GBDTParams(n_rounds=60, max_depth=3, learning_rate=0.15)
    out = ensembles.two_stage(X, y, X, stage1_params=fast, stage2_params=fast)
    assert out["best_f1"] > 0.5
    assert out["n_filtered"] >= 0
    assert len(out["test_preds"]) == n


def test_astromer_fallback_without_weights(tiny_dataset, tmp_path):
    """Without a pretrained artifact, `extract` warns and emits the
    reference's model-unavailable all-NaN 146-feature surface
    (src/features/astromer_embeddings.py:211-215) — works on unlabeled
    test splits too (no supervised training in the fallback)."""
    from mallorn_tpu.features import astromer

    missing = tmp_path / "nope.npz"
    assert astromer.available(missing) is False
    packed, meta, _ = tiny_dataset
    with pytest.warns(UserWarning, match="pretrained astromer"):
        feats = astromer.extract(packed, meta, weights_path=missing)
    assert sorted(feats) == sorted(astromer.feature_names())
    assert all(np.isnan(np.asarray(v)).all() for v in feats.values())
    # unlabeled split: same surface, no crash
    with pytest.warns(UserWarning):
        feats_te = astromer.extract(packed, None, weights_path=missing)
    assert len(feats_te) == 146


@pytest.mark.slow
def test_astromer_learned_embeddings(tiny_dataset):
    from mallorn_tpu.features import astromer

    packed, meta, _ = tiny_dataset
    feats = astromer.extract_learned_embeddings(packed, meta, d_model=16,
                                                n_epochs=10)
    assert len(feats) == 16
    assert np.isfinite(np.asarray(feats["emb_0"])).all()
