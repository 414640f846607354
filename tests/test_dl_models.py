"""DL baselines: forward shapes, gradient flow, and that each model can
overfit a small synthetic set (the capability bar for documented-failure
baselines)."""

import numpy as np
import pytest

from mallorn_tpu.data.synthetic import generate_dataset
from mallorn_tpu.models import (ATAT, LSTMClassifier, SequenceBatch,
                                TransformerClassifier, make_sequence_batch)
from mallorn_tpu.models.train_dl import focal_loss, train_model


@pytest.fixture(scope="module")
def seq_batch():
    packed, meta, _ = generate_dataset(48, seed=5, tde_frac=0.3)
    return make_sequence_batch(packed, meta)


def test_sequence_batch_shapes(seq_batch):
    b = seq_batch
    n, t = b.mask.shape
    assert b.features.shape == (n, t, 3)
    assert b.band.shape == (n, t)
    assert b.meta.shape == (n, 2)
    assert not np.isnan(np.asarray(b.features)).any()


@pytest.mark.parametrize("model_cls,kwargs", [
    (LSTMClassifier, dict(hidden_dim=16, n_layers=1)),
    (TransformerClassifier, dict(d_model=16, n_layers=1)),
])
@pytest.mark.slow
def test_model_overfits(seq_batch, model_cls, kwargs):
    model = model_cls(**kwargs)
    res = train_model(model, seq_batch, val_batch=seq_batch,
                      n_epochs=150, lr=3e-3)
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0]
    assert res.val_f1 > 0.8, res.val_f1  # trivially overfits train=val


def test_mlp_cv_overfits_separable():
    """v14 residual MLP (reference scripts/train_v14_nn_features.py):
    5-fold CV on a linearly separable tabular matrix reaches high OOF F1
    and returns averaged test preds."""
    from mallorn_tpu.models.mlp import train_mlp_cv

    rng = np.random.default_rng(0)
    n = 300
    X = rng.normal(size=(n, 12)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0.8).astype(np.float32)
    X[rng.uniform(size=n) < 0.05, 2] = np.nan  # NaN tolerance
    out = train_mlp_cv(X, y, X_test=X[:50], n_epochs=300,
                       hidden_dims=(32, 16), n_folds=3)
    assert out["best_f1"] > 0.8, out["best_f1"]
    assert out["test_preds"].shape == (50,)
    assert np.isfinite(out["oof"]).all()


def test_band_batch_shapes():
    from mallorn_tpu.models import make_band_batch

    packed, meta, _ = generate_dataset(16, seed=6, tde_frac=0.3)
    b = make_band_batch(packed, meta)
    n, nb, t = b.mask.shape
    assert nb == 6
    assert b.features.shape == (n, nb, t, 3)
    assert not np.isnan(np.asarray(b.features)).any()
    # padding carries zeros
    feats = np.asarray(b.features)
    assert (feats[~np.asarray(b.mask)] == 0).all()


@pytest.mark.slow
def test_gru_overfits():
    """v27 band-parallel attention GRU (reference
    scripts/train_v27_gru.py:147-260) overfits a tiny set and exposes
    the GBDT-hybrid feature hook."""
    from mallorn_tpu.models import GRUClassifier, make_band_batch

    packed, meta, _ = generate_dataset(48, seed=5, tde_frac=0.3)
    batch = make_band_batch(packed, meta)
    model = GRUClassifier(hidden_dim=16, n_layers=1)
    res = train_model(model, batch, val_batch=batch, n_epochs=150, lr=3e-3)
    assert np.isfinite(res.losses).all()
    assert res.val_f1 > 0.8, res.val_f1
    feats = model.apply(res.params, batch, train=False, return_features=True)
    assert feats.shape == (batch.mask.shape[0], 32)
    assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.slow
def test_atat_overfits(seq_batch):
    import jax.numpy as jnp

    tab = jnp.concatenate([seq_batch.meta,
                           seq_batch.features[:, :, 0].mean(1, keepdims=True)], 1)
    model = ATAT(embed_dim=16, n_lc_layers=1, n_tab_layers=1)
    res = train_model(model, seq_batch, val_batch=seq_batch,
                      tabular=tab, val_tabular=tab, n_epochs=150, lr=3e-3)
    assert res.val_f1 > 0.8, res.val_f1
