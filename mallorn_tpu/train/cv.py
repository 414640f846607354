"""Cross-validation orchestration + OOF threshold sweep.

Mirrors the reference's L4 validation layer (reference:
scripts/train_v34a_bazin.py:150-208): stratified 5-fold with
``random_state=42``, per-fold early-stopped training, OOF predictions,
test predictions averaged over folds, and an F1-maximizing threshold
grid search on the OOF vector.

Fold assignment and F1 run on host (sklearn — tiny compute, exact parity
with the reference); training/prediction run on device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
from sklearn.metrics import f1_score
from sklearn.model_selection import StratifiedKFold

from mallorn_tpu.trees.gbdt import (GBDTModel, GBDTParams, predict_proba,
                                    predict_margin, train_gbdt,
                                    train_gbdt_folds)


def threshold_sweep(y: np.ndarray, probs: np.ndarray,
                    grid: Optional[np.ndarray] = None) -> Tuple[float, float]:
    """Best (f1, threshold) over the reference grid
    np.linspace(0.05, 0.5, n) (reference: train_v34a_bazin.py:200-208).

    Vectorized: one [grid, N] comparison instead of per-threshold
    ``sklearn.f1_score`` calls (measured ~5 s per CV at 200 x 3054 from
    sklearn's per-call overhead). Identical semantics: f1 =
    2tp / (2tp + fp + fn), 0 when the denominator is 0, first grid
    point wins ties (matches the sequential strict-> scan)."""
    if grid is None:
        grid = np.linspace(0.05, 0.5, 100)
    grid = np.asarray(grid, dtype=np.float64)
    y = np.asarray(y).astype(bool)
    probs = np.asarray(probs, dtype=np.float64)
    pred = probs[None, :] > grid[:, None]  # [T, N]
    tp = (pred & y[None, :]).sum(axis=1)
    fp = (pred & ~y[None, :]).sum(axis=1)
    fn = ((~pred) & y[None, :]).sum(axis=1)
    denom = 2 * tp + fp + fn
    with np.errstate(invalid="ignore", divide="ignore"):
        f1 = np.where(denom > 0, 2.0 * tp / np.maximum(denom, 1), 0.0)
    best = int(np.argmax(f1))
    if f1[best] <= 0.0:
        return 0.0, 0.5
    return float(f1[best]), float(grid[best])


@dataclasses.dataclass
class CVResult:
    oof_preds: np.ndarray  # [N_train] probabilities
    test_preds: np.ndarray  # [N_test] fold-averaged probabilities
    fold_f1s: List[float]
    best_f1: float
    best_threshold: float
    importance_gain: np.ndarray  # [F] summed over folds
    models: List[GBDTModel]

    def confusion(self, y: np.ndarray) -> Dict[str, int]:
        pred = (self.oof_preds > self.best_threshold).astype(int)
        return {
            "tp": int(((pred == 1) & (y == 1)).sum()),
            "fp": int(((pred == 1) & (y == 0)).sum()),
            "fn": int(((pred == 0) & (y == 1)).sum()),
            "tn": int(((pred == 0) & (y == 0)).sum()),
        }


def train_cv_multiclass(
    X_train: np.ndarray,
    y_class: np.ndarray,
    X_test: Optional[np.ndarray] = None,
    params: GBDTParams = GBDTParams(),
    n_folds: int = 5,
    early_stopping_rounds: int = 50,
    seed: int = 42,
    mesh=None,
    verbose: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray], List[GBDTModel]]:
    """K-class multi:softprob CV: OOF class probabilities + fold-averaged
    test probabilities (reference: scripts/train_v62_multiclass_ensemble.py
    :176-227 — 5-fold StratifiedKFold on the encoded class labels, per-fold
    early stopping on mlogloss, ``model.predict`` = softmax probabilities).

    ``params.num_class`` must be >= 2; labels are int class ids 0..K-1.
    ``mesh`` (or the process default mesh): folds train row-sharded with
    psum'd histograms, identical forests to single-device.
    Returns (oof_probs [N, K], test_probs [N, K] or None, models)."""
    if params.num_class < 2:
        raise ValueError("params.num_class must be >= 2")
    if mesh is None:
        from mallorn_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
    y_class = np.asarray(y_class)
    K = params.num_class
    skf = StratifiedKFold(n_splits=n_folds, shuffle=True, random_state=seed)
    splits = list(skf.split(X_train, y_class))
    pad_train = max(len(tr) for tr, _ in splits)
    pad_val = max(len(va) for _, va in splits)

    X_parent = np.asarray(X_train, np.float32)
    folds = []
    for tr, va in splits:
        folds.append({
            "X": X_parent[tr], "y": y_class[tr].astype(np.float32),
            "w": None,
            "X_val": X_parent[va], "y_val": y_class[va].astype(np.float32),
            "spw": 1.0, "seed": params.seed,
            "X_parent": X_parent, "tr_idx": tr, "va_idx": va,
        })
    if mesh is not None:
        from mallorn_tpu.parallel.sharded_train import train_gbdt_folds_sharded

        models = train_gbdt_folds_sharded(
            mesh, folds, params,
            early_stopping_rounds=early_stopping_rounds,
            pad_rows_to=pad_train, pad_val_rows_to=pad_val)
    else:
        models = train_gbdt_folds(
            folds, params, early_stopping_rounds=early_stopping_rounds,
            pad_rows_to=pad_train, pad_val_rows_to=pad_val)

    def _softmax(m):  # [..., K] on the last axis
        z = m - m.max(axis=-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=-1, keepdims=True)

    oof = np.zeros((len(y_class), K), np.float64)
    if all(m.val_margin is not None for m in models):
        for model, (_, va) in zip(models, splits):
            oof[va] = _softmax(np.asarray(model.val_margin).T[: len(va)])
    else:
        from mallorn_tpu.trees.gbdt import predict_margin_folds

        vm = predict_margin_folds(models, [X_parent[va] for _, va in splits])
        for fi, (_, va) in enumerate(splits):
            oof[va] = _softmax(vm[fi][: len(va)])

    test_probs = None
    if X_test is not None:
        from mallorn_tpu.trees.gbdt import predict_margin_folds

        tm = predict_margin_folds(models, np.asarray(X_test, np.float32))
        test_probs = _softmax(tm).mean(axis=0)  # [N_test, K]
    if verbose:
        acc = float((oof.argmax(-1) == y_class).mean())
        print(f"   [mc] OOF accuracy={acc:.4f} "
              f"best_iters={[m.best_iteration for m in models]}", flush=True)
    return oof, test_probs, models


def train_cv(
    X_train: np.ndarray,
    y: np.ndarray,
    X_test: Optional[np.ndarray] = None,
    params: GBDTParams = GBDTParams(),
    sample_weight: Optional[np.ndarray] = None,
    use_scale_pos_weight: bool = True,
    objective=None,
    sigmoid_outputs: bool = False,
    n_folds: int = 5,
    early_stopping_rounds: int = 50,
    seed: int = 42,
    threshold_grid: Optional[np.ndarray] = None,
    pad_features_to: Optional[int] = None,
    batched_folds: bool = True,
    mesh=None,
    extra_train: Optional[Tuple] = None,
    y_train_soft: Optional[np.ndarray] = None,
    train_transform=None,
    verbose: bool = False,
) -> CVResult:
    """Stratified K-fold GBDT training with OOF + averaged test predictions.

    ``sigmoid_outputs``: custom objectives produce raw margins that need an
    explicit sigmoid (reference: train_v92_focal_adversarial.py:256-259);
    the built-in logistic objective already reports probabilities.

    ``batched_folds``: train all folds as one vmapped computation (one
    compile + one dispatch; folds run concurrently on the chip).

    ``mesh``: a ``jax.sharding.Mesh`` — folds train with their row axis
    sharded over the mesh and histograms psum'd over ICI, producing the
    exact same forests as single-device training (global-row-id
    subsampling keeps even subsample < 1 identical).

    ``extra_train``: ``(X_ext, y_ext[, w_ext])`` — an EXTERNAL labeled
    set appended to every fold's training rows while folds/validation/OOF
    remain on the primary data only (the v16 PLAsTiCC-combination
    recipe: train on combined, validate on the competition distribution;
    reference scripts/prepare_plasticc_data.py +
    train_v16_plasticc_combined.py:160-190).

    ``y_train_soft``: float training/eval-metric targets (label smoothing
    v102, distillation v108 — reference
    train_v102_label_smoothing.py:113-137: the model trains and
    early-stops on the SMOOTHED labels while fold stratification, OOF F1
    and the threshold sweep stay on the hard ``y``).

    ``train_transform``: ``(X_f, y_f, w_f, fold_index) -> (X, y, w)``
    applied to each fold's PRIMARY training rows only (before any
    ``extra_train`` append); validation rows, OOF and the threshold
    sweep stay on the untouched originals. This is the per-fold
    augmentation hook (MixUp v106 — reference
    train_v106_mixup.py:123-164 mixes X_tr within the fold and
    validates on the original labels). Folds then carry their own
    matrices, so the shared-parent binning shortcut is skipped and the
    returned ``y`` may be float (soft).
    """
    if mesh is None:
        from mallorn_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
    y = np.asarray(y)
    y_soft = (np.asarray(y_train_soft, np.float32)
              if y_train_soft is not None else None)
    skf = StratifiedKFold(n_splits=n_folds, shuffle=True, random_state=seed)

    X_ext = y_ext = w_ext = None
    if extra_train is not None:
        X_ext = np.asarray(extra_train[0], np.float32)
        y_ext = np.asarray(extra_train[1])
        w_ext = (np.asarray(extra_train[2], np.float32)
                 if len(extra_train) > 2 and extra_train[2] is not None
                 else np.ones(len(y_ext), np.float32))

    oof = np.zeros(len(y), dtype=np.float64)
    test_preds = (np.zeros((len(X_test), n_folds)) if X_test is not None else None)
    importance = None
    fold_f1s: List[float] = []
    models: List[GBDTModel] = []

    # pad every fold to a shared shape -> one compiled training graph
    splits = list(skf.split(X_train, y))
    n_ext = 0 if X_ext is None else len(X_ext)
    pad_train = max(len(tr) for tr, _ in splits) + n_ext
    pad_val = max(len(va) for _, va in splits)

    def fold_rows(tr, fold_index=0):
        """Primary fold-train rows (+ the full external set, v16).

        Returns (X, y_train, y_hard, w): ``y_train`` is what the objective
        sees (soft when y_train_soft is given), ``y_hard`` feeds
        scale_pos_weight only."""
        Xf, yh = X_train[tr], y[tr]
        yf = y_soft[tr] if y_soft is not None else yh
        wf = sample_weight[tr] if sample_weight is not None else None
        if train_transform is not None:
            Xf, yf, wf = train_transform(
                np.asarray(Xf, np.float32),
                np.asarray(yf, np.float32), wf, fold_index)
            # hard labels exist only for scale_pos_weight; round the
            # (possibly soft) transformed targets for that count
            yh = (np.asarray(yf) >= 0.5).astype(y.dtype)
        if X_ext is not None:
            Xf = np.vstack([np.asarray(Xf, np.float32), X_ext])
            yf = np.concatenate([yf, y_ext])
            yh = np.concatenate([yh, y_ext])
            wf = np.concatenate(
                [np.ones(len(tr), np.float32) if wf is None else wf, w_ext])
        return Xf, yf, yh, wf

    def fold_spw(yf):
        return float((yf == 0).sum() / max((yf == 1).sum(), 1)) \
            if use_scale_pos_weight else 1.0

    if batched_folds:
        # one parent matrix + per-fold row indices lets _stack_folds bin
        # all folds from a single global sort (fit_bins_folds)
        X_parent = np.asarray(X_train, np.float32)
        if X_ext is not None:
            X_parent = np.vstack([X_parent, X_ext])
        folds = []
        for k, (tr, va) in enumerate(splits):
            Xf, yf, yh, wf = fold_rows(tr, k)
            tr_idx = (tr if X_ext is None
                      else np.concatenate([tr, len(y) + np.arange(n_ext)]))
            fold = {
                "X": Xf, "y": yf, "w": wf,
                "X_val": X_train[va],
                # the early-stop metric sees the soft val labels too
                # (reference eval_set=[(X_val, y_smooth[val_idx])])
                "y_val": y_soft[va] if y_soft is not None else y[va],
                "spw": fold_spw(yh), "seed": params.seed,
            }
            # transformed folds carry their own values; the rows are no
            # longer a subset of the parent matrix, so the shared-sort
            # binning shortcut does not apply
            if train_transform is None:
                fold.update({"X_parent": X_parent, "tr_idx": tr_idx,
                             "va_idx": va})
            folds.append(fold)
        if train_transform is not None:
            pad_train = max(len(f["X"]) for f in folds)
        if mesh is not None:
            from mallorn_tpu.parallel.sharded_train import train_gbdt_folds_sharded

            models = train_gbdt_folds_sharded(
                mesh, folds, params, objective=objective,
                early_stopping_rounds=early_stopping_rounds,
                pad_rows_to=pad_train, pad_val_rows_to=pad_val,
                pad_features_to=pad_features_to)
        else:
            import os as _os
            import time as _time

            _t0 = _time.perf_counter()
            models = train_gbdt_folds(
                folds, params, objective=objective,
                early_stopping_rounds=early_stopping_rounds,
                pad_rows_to=pad_train, pad_val_rows_to=pad_val,
                pad_features_to=pad_features_to)
            if _os.environ.get("MALLORN_TIMERS"):
                print(f"    [cv] fit: {_time.perf_counter() - _t0:.2f}s "
                      f"best_iters={[m.best_iteration for m in models]}",
                      flush=True)

    # all-fold test + OOF predictions as ONE vmapped forest scan each
    # (5 sequential 500-tree scans measured ~3s on TPU). OOF margins come
    # straight from the fit when it tracked them (GBDTModel.val_margin:
    # the boosting loop holds the best-iteration val margins, making a
    # separate predict pass — and its executable upload — redundant).
    test_margin_folds = None
    oof_margin_folds = None
    if batched_folds and models:
        from mallorn_tpu.trees.gbdt import predict_margin_folds

        _t0 = __import__("time").perf_counter()
        if X_test is not None:
            test_margin_folds = predict_margin_folds(models, X_test)
        if all(m.val_margin is not None for m in models):
            oof_margin_folds = [m.val_margin for m in models]
        else:
            oof_margin_folds = predict_margin_folds(
                models, [X_train[va] for _, va in splits])
        import os as _os
        if _os.environ.get("MALLORN_TIMERS"):
            print(f"    [cv] predicts: "
                  f"{__import__('time').perf_counter() - _t0:.2f}s (oof"
                  f"{'+test' if test_margin_folds is not None else ''})",
                  flush=True)

    _tloop = __import__("time").perf_counter()
    for fold, (tr, va) in enumerate(splits):
        if batched_folds:
            model = models[fold]
        else:
            Xf, yf, yh, w = fold_rows(tr, fold)
            model = train_gbdt(
                Xf, yf, params,
                sample_weight=w,
                scale_pos_weight=fold_spw(yh),
                objective=objective,
                X_val=X_train[va],
                y_val=y_soft[va] if y_soft is not None else y[va],
                early_stopping_rounds=early_stopping_rounds,
                pad_rows_to=pad_train, pad_val_rows_to=pad_val,
                pad_features_to=pad_features_to,
            )
            models.append(model)

        use_sigmoid = sigmoid_outputs or objective is None

        def _link(m):
            return 1.0 / (1.0 + np.exp(-m)) if use_sigmoid else m

        if test_margin_folds is not None:
            test_p = _link(test_margin_folds[fold])
        elif X_test is not None:
            test_p = np.asarray(predict_margin(model, X_test))
            test_p = _link(test_p)
        else:
            test_p = None
        if oof_margin_folds is not None:
            val_p = _link(oof_margin_folds[fold][: len(va)])
        elif model.val_margin is not None:
            val_p = _link(model.val_margin[: len(va)])
        else:
            val_p = _link(np.asarray(predict_margin(model, X_train[va])))

        oof[va] = val_p
        if test_preds is not None:
            test_preds[:, fold] = test_p

        imp = np.asarray(model.importance_gain)
        importance = imp if importance is None else importance + imp

        f1, t = threshold_sweep(y[va], val_p,
                                np.linspace(0.05, 0.5, 50))
        fold_f1s.append(f1)
        if verbose:
            print(f"   fold {fold + 1}/{n_folds}: best_iter="
                  f"{model.best_iteration} F1={f1:.4f} @ {t:.3f}", flush=True)

    import os as _os
    if _os.environ.get("MALLORN_TIMERS"):
        print(f"    [cv] fold-loop: "
              f"{__import__('time').perf_counter() - _tloop:.2f}s", flush=True)
    best_f1, best_t = threshold_sweep(y, oof, threshold_grid)
    return CVResult(
        oof_preds=oof,
        test_preds=test_preds.mean(axis=1) if test_preds is not None else None,
        fold_f1s=fold_f1s,
        best_f1=best_f1,
        best_threshold=best_t,
        importance_gain=importance,
        models=models,
    )
