"""Pretrained ASTROMER-style embeddings: pretraining objective, artifact
round-trip, and the reference's 146-feature extraction surface
(reference: src/features/astromer_embeddings.py)."""

import numpy as np
import pytest

from mallorn_tpu.data.synthetic import generate_dataset
from mallorn_tpu.features import astromer
from mallorn_tpu.models.astromer import (BandSequences, load_pretrained,
                                         normalize_band, pretrain,
                                         save_pretrained)


@pytest.fixture(scope="module")
def band_seqs():
    packed, _, _ = generate_dataset(n_objects=60, seed=7)
    nb = packed.band_time.shape[0] * 6
    return normalize_band(packed.band_time.reshape(nb, -1),
                          packed.band_flux.reshape(nb, -1),
                          packed.band_err.reshape(nb, -1),
                          packed.band_mask.reshape(nb, -1))


def test_normalize_band_semantics(band_seqs):
    """Reference prep: valid = flux>0 & err>0, time from 0, standardized
    magnitudes (src/features/astromer_embeddings.py:52-118)."""
    m = np.asarray(band_seqs.mask)
    t = np.asarray(band_seqs.times)
    mag = np.asarray(band_seqs.mags)
    assert (t[m] >= 0).all()
    assert np.isfinite(mag[m]).all()
    assert (mag[~m] == 0).all()
    # standardized: per-sequence mean ~0 for well-populated rows
    row = np.argmax(m.sum(1))
    assert abs(mag[row][m[row]].mean()) < 1e-4


def test_pretraining_beats_mean_predictor(band_seqs):
    """Masked-reconstruction MSE must drop well below 1.0 (the variance of
    standardized magnitudes = the predict-the-mean floor), i.e. the encoder
    genuinely reconstructs hidden observations from visible ones."""
    keep = np.asarray(band_seqs.n_valid) >= 5
    seqs = BandSequences(*(np.asarray(a)[keep] for a in band_seqs))
    _, _, hist = pretrain(seqs, d_model=16, n_layers=1, n_steps=150,
                          batch_size=64, seed=0, eval_every=50)
    first, last = hist[0][1], hist[-1][1]
    assert last < first, (first, last)
    assert last < 0.8, f"masked-recon MSE {last} not below mean-predictor floor"


def test_artifact_roundtrip(tmp_path, band_seqs):
    keep = np.asarray(band_seqs.n_valid) >= 5
    seqs = BandSequences(*(np.asarray(a)[keep] for a in band_seqs))
    params, model, _ = pretrain(seqs, d_model=16, n_layers=1, n_steps=3,
                                batch_size=32, seed=1, eval_every=1)
    path = tmp_path / "w.npz"
    save_pretrained(path, params, {"d_model": 16, "n_heads": 4, "n_layers": 1})
    p2, m2, cfg = load_pretrained(path)
    assert cfg["d_model"] == 16
    emb1, _ = model.apply(params, seqs.times[:4], seqs.mags[:4],
                          seqs.errs[:4], seqs.mask[:4])
    emb2, _ = m2.apply(p2, seqs.times[:4], seqs.mags[:4],
                       seqs.errs[:4], seqs.mask[:4])
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2))


def test_shipped_artifact_present():
    """The in-repo artifact must ship (tools/pretrain_astromer.py recipe)."""
    assert astromer.available(), "artifacts/astromer_selfsup_synthetic.npz missing"
    assert "self-supervised" in astromer.pretrained_origin()


def test_extract_reference_surface():
    """146 features with the reference's names; finite for well-observed
    bands, NaN where a band has <5 valid points
    (src/features/astromer_embeddings.py:152-266)."""
    packed, meta, _ = generate_dataset(n_objects=24, seed=11)
    feats = astromer.extract(packed, meta)
    names = astromer.feature_names()
    assert sorted(feats) == sorted(names)
    assert len(names) == 4 * 36 + 2

    bm = np.asarray(packed.band_mask)
    bf = np.asarray(packed.band_flux)
    be = np.asarray(packed.band_err)
    for bi, band in zip((1, 2, 3, 4), ("g", "r", "i", "z")):
        nv = (bm[:, bi] & (bf[:, bi] > 0) & (be[:, bi] > 0)).sum(1)
        col = np.asarray(feats[f"{band}_astromer_emb_0"])
        assert np.isfinite(col[nv >= 5]).all()
        assert np.isnan(col[nv < 5]).all()

    # deterministic across calls (pure pretrained forward, no training)
    feats2 = astromer.extract(packed, meta)
    np.testing.assert_array_equal(np.asarray(feats["g_astromer_emb_3"]),
                                  np.asarray(feats2["g_astromer_emb_3"]))


def test_extract_embeddings_discriminate():
    """Pooled embeddings should separate object classes at least weakly:
    a linear probe on emb features beats chance on TDE-vs-rest."""
    packed, meta, _ = generate_dataset(n_objects=160, seed=3, tde_frac=0.3)
    feats = astromer.extract(packed, meta)
    cols = [np.asarray(feats[n]) for n in astromer.feature_names()]
    X = np.nan_to_num(np.stack(cols, 1), nan=0.0, posinf=0.0, neginf=0.0)
    y = np.asarray(meta.target)
    mu, sd = X.mean(0), X.std(0) + 1e-9
    Xn = (X - mu) / sd
    # closed-form ridge probe
    w = np.linalg.solve(Xn.T @ Xn + 10.0 * np.eye(X.shape[1]),
                        Xn.T @ (2 * y - 1))
    acc = ((Xn @ w > 0) == (y > 0.5)).mean()
    base = max(y.mean(), 1 - y.mean())
    assert acc > base + 0.03, (acc, base)
