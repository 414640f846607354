"""Residual MLP on engineered features (v14).

Flax port of the capability in reference scripts/train_v14_nn_features.py
:51-117 (`MLPClassifier`): input normalization, projected input, GELU
residual hidden stack, a skip projection of the normalized input
concatenated before the head — an NN ensemble member over the SAME
tabular matrix the GBDT consumes.

Design notes (TPU-first):
- The reference's BatchNorm1d runs on StandardScaler'd inputs and is
  trained full-batch here, where it degenerates to a fixed affine of the
  standardization; this port standardizes per fold on the host and uses
  LayerNorm in the hidden blocks — no mutable batch_stats collection, so
  the whole CV loop stays functionally pure under jit.
- All folds train sequentially with the same jitted step (shapes are
  fold-invariant after padding rows to the largest fold).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResidualMLP(nn.Module):
    hidden_dims: Sequence[int] = (128, 64, 32)
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(self.hidden_dims[0])(x))
        for d in self.hidden_dims[1:]:
            h = nn.Dense(d)(h)
            h = nn.LayerNorm()(h)
            h = nn.gelu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        skip = nn.Dense(self.hidden_dims[-1])(x)
        combined = jnp.concatenate([h, skip], axis=-1)
        o = nn.gelu(nn.Dense(self.hidden_dims[-1])(combined))
        o = nn.Dropout(self.dropout, deterministic=not train)(o)
        return nn.Dense(1)(o)[..., 0]  # logits


def train_mlp_cv(X, y, X_test=None, n_folds: int = 5, n_epochs: int = 400,
                 lr: float = 3e-3, weight_decay: float = 1e-4,
                 hidden_dims: Sequence[int] = (128, 64, 32),
                 dropout: float = 0.3, seed: int = 42,
                 pos_weight: float = 10.0) -> dict:
    """5-fold CV of the residual MLP on a feature matrix (reference
    scripts/train_v14_nn_features.py main loop: StratifiedKFold(5, seed 42),
    per-fold StandardScaler, AdamW + cosine schedule, weighted BCE for the
    ~5% positive class, OOF threshold sweep, per-fold test preds averaged).
    ``n_epochs`` counts FULL-BATCH Adam steps (the reference's mini-batch
    epochs are ~12 steps each, so its 30 epochs ~= 400 steps here).

    Returns {oof, best_f1, threshold, test_preds}.
    """
    import optax
    from sklearn.model_selection import StratifiedKFold

    from mallorn_tpu.train.cv import threshold_sweep

    X = np.nan_to_num(np.asarray(X, np.float32), nan=0.0,
                      posinf=0.0, neginf=0.0)
    y = np.asarray(y, np.float32)
    n = len(y)
    oof = np.zeros(n, np.float32)
    test_sum = None

    model = ResidualMLP(hidden_dims=tuple(hidden_dims), dropout=dropout)
    skf = StratifiedKFold(n_splits=n_folds, shuffle=True, random_state=seed)

    @jax.jit
    def predict(params, Xd):
        return jax.nn.sigmoid(model.apply(params, Xd, train=False))

    def fit_one(Xtr, ytr, rng):
        tx = optax.adamw(optax.cosine_decay_schedule(lr, n_epochs),
                         weight_decay=weight_decay)
        params = model.init({"params": rng}, Xtr[:2], train=False)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            rng, drng = jax.random.split(rng)

            def loss(p):
                logits = model.apply(p, Xtr, train=True,
                                     rngs={"dropout": drng})
                ce = optax.sigmoid_binary_cross_entropy(logits, ytr)
                w = jnp.where(ytr > 0.5, pos_weight, 1.0)
                return jnp.mean(w * ce)

            l, g = jax.value_and_grad(loss)(params)
            updates, opt_state2 = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, rng, l

        rng_loop = rng
        for _ in range(n_epochs):
            params, opt_state, rng_loop, _ = step(params, opt_state, rng_loop)
        return params

    for fi, (tr, va) in enumerate(skf.split(X, y)):
        mu = X[tr].mean(0)
        sd = X[tr].std(0)
        sd = np.where(sd > 0, sd, 1.0)

        def S(A):
            return jnp.asarray((A - mu) / sd)

        params = fit_one(S(X[tr]), jnp.asarray(y[tr]),
                         jax.random.PRNGKey(seed + fi))
        oof[va] = np.asarray(predict(params, S(X[va])))
        if X_test is not None:
            Xt = np.nan_to_num(np.asarray(X_test, np.float32), nan=0.0,
                               posinf=0.0, neginf=0.0)
            p = np.asarray(predict(params, S(Xt)))
            test_sum = p if test_sum is None else test_sum + p

    best_f1, threshold = threshold_sweep(y, oof)
    return {"oof": oof, "best_f1": float(best_f1),
            "threshold": float(threshold),
            "test_preds": None if test_sum is None else test_sum / n_folds}
