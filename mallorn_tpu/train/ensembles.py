"""Ensembling utilities: simple/rank/weight-optimized blends and the
two-stage classifier.

Mirrors the reference's L4 ensembling scripts (SURVEY.md §2.5):
- simple average (ensemble_v15, train_baseline's 50/50 blend);
- rank averaging (ensemble_v38a, train_v120): probabilities -> descending
  ranks (scipy rankdata 'average' on negated probs), averaged, then
  rescaled to [0, 1] pseudo-probabilities;
- weight-optimized blend (train_v125 — documented overfit in the
  reference, BENCHMARKS.md:209-213): grid-searched convex weights
  maximizing OOF F1;
- two-stage classifier (train_v60): stage-1 filters confident negatives
  at a high-recall threshold, stage-2 retrains on the survivors;
- stacking (train_v119): a meta-learner trained on the base models' OOF
  prediction columns (+ mean/std agreement features), CV'd so the meta
  predictions are themselves out-of-fold.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.stats import rankdata

from mallorn_tpu.train.cv import threshold_sweep, train_cv
from mallorn_tpu.trees.gbdt import GBDTParams


def average_blend(preds: Sequence[np.ndarray],
                  weights: Optional[Sequence[float]] = None) -> np.ndarray:
    preds = np.stack([np.asarray(p) for p in preds])
    if weights is None:
        return preds.mean(axis=0)
    w = np.asarray(weights, dtype=np.float64)
    return (preds * w[:, None]).sum(axis=0) / w.sum()


def rank_average(preds: Sequence[np.ndarray]) -> np.ndarray:
    """Average of descending ranks, rescaled to [0, 1] (higher = more
    TDE-like), matching ensemble_v38a_rank.py:65-90."""
    ranks = [rankdata(-np.asarray(p), method="average") for p in preds]
    mean_rank = np.mean(ranks, axis=0)
    n = len(mean_rank)
    # rank 1 (most confident) -> 1.0; rank n -> 0.0
    return (n - mean_rank) / (n - 1) if n > 1 else np.ones_like(mean_rank)


def optimize_blend_weights(oof_preds: Sequence[np.ndarray], y: np.ndarray,
                           n_grid: int = 21) -> Tuple[np.ndarray, float, float]:
    """Grid-search convex weights maximizing OOF F1 (two/three models).
    Returns (weights, best_f1, best_threshold)."""
    k = len(oof_preds)
    grid = np.linspace(0, 1, n_grid)
    best = (None, -1.0, 0.5)
    if k == 2:
        combos = [(w, 1 - w) for w in grid]
    elif k == 3:
        combos = [(a, b, 1 - a - b) for a in grid for b in grid if a + b <= 1]
    else:
        raise ValueError("optimize_blend_weights supports 2 or 3 models")
    for w in combos:
        blend = average_blend(oof_preds, w)
        f1, t = threshold_sweep(y, blend)
        if f1 > best[1]:
            best = (np.asarray(w), f1, t)
    return best


def _logreg_fit(X: np.ndarray, y: np.ndarray, l2: float = 1.0,
                n_iter: int = 50) -> np.ndarray:
    """L2-regularized logistic regression by Newton's method (the
    reference's LogisticRegression meta-learner,
    scripts/train_v119_stacking.py:33,143-163). Returns [d+1] weights
    (bias last). Tiny dense problem — plain NumPy on host."""
    n, d = X.shape
    A = np.concatenate([X, np.ones((n, 1))], axis=1)
    w = np.zeros(d + 1)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-np.clip(A @ w, -30, 30)))
        g = A.T @ (p - y) + l2 * np.r_[w[:-1], 0.0]
        s = np.maximum(p * (1 - p), 1e-6)
        H = (A * s[:, None]).T @ A + l2 * np.diag(np.r_[np.ones(d), 0.0])
        step = np.linalg.solve(H, g)
        w = w - step
        if np.abs(step).max() < 1e-10:
            break
    return w


def _logreg_predict(w: np.ndarray, X: np.ndarray) -> np.ndarray:
    A = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    return 1.0 / (1.0 + np.exp(-np.clip(A @ w, -30, 30)))


def stack_oof(
    oof_preds: Sequence[np.ndarray], y: np.ndarray,
    test_preds: Optional[Sequence[np.ndarray]] = None,
    n_folds: int = 5, seed: int = 42, l2: float = 1.0,
    add_agreement_features: bool = True,
) -> Dict[str, np.ndarray]:
    """Two-level stacking (train_v119): base-model OOF prediction columns
    (+ mean/std agreement features, :151-163) feed a logistic-regression
    meta-learner, itself cross-validated so the returned meta predictions
    are out-of-fold. Test predictions average the fold meta-models."""
    from sklearn.model_selection import StratifiedKFold

    X_meta = np.column_stack([np.asarray(p, np.float64) for p in oof_preds])
    X_test = (np.column_stack([np.asarray(p, np.float64) for p in test_preds])
              if test_preds is not None else None)
    if add_agreement_features:
        X_meta = np.hstack([X_meta, X_meta.mean(1, keepdims=True),
                            X_meta.std(1, keepdims=True)])
        if X_test is not None:
            X_test = np.hstack([X_test, X_test.mean(1, keepdims=True),
                                X_test.std(1, keepdims=True)])

    y = np.asarray(y, np.float64)
    skf = StratifiedKFold(n_folds, shuffle=True, random_state=seed)
    oof = np.zeros(len(y))
    test_acc = np.zeros(len(X_test)) if X_test is not None else None
    for tr, va in skf.split(X_meta, y):
        w = _logreg_fit(X_meta[tr], y[tr], l2=l2)
        oof[va] = _logreg_predict(w, X_meta[va])
        if X_test is not None:
            test_acc += _logreg_predict(w, X_test) / n_folds

    f1, thresh = threshold_sweep(y, oof)
    return {"oof_preds": oof, "test_preds": test_acc,
            "best_f1": f1, "threshold": thresh}


def two_stage(
    X_train: np.ndarray, y: np.ndarray,
    X_test: Optional[np.ndarray] = None,
    stage1_params: GBDTParams = GBDTParams(),
    stage2_params: GBDTParams = GBDTParams(),
    stage1_recall_threshold: float = 0.02,
    sample_weight: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Two-stage pipeline (train_v60): stage-1 CV filters objects whose
    OOF probability is below a very conservative threshold; stage-2
    retrains on the survivors. Filtered objects get probability 0."""
    cv1 = train_cv(X_train, y, X_test, stage1_params,
                   sample_weight=sample_weight)

    survive = cv1.oof_preds >= stage1_recall_threshold
    # never filter out actual positives from the training pool entirely
    survive = survive | (y == 1)

    cv2 = train_cv(X_train[survive], y[survive],
                   X_test, stage2_params,
                   sample_weight=sample_weight[survive] if sample_weight is not None else None)

    oof = np.zeros(len(y))
    oof[survive] = cv2.oof_preds
    test_preds = None
    if X_test is not None:
        test_survive = cv1.test_preds >= stage1_recall_threshold
        test_preds = np.where(test_survive, cv2.test_preds, 0.0)

    f1, thresh = threshold_sweep(y, oof)
    return {"oof_preds": oof, "test_preds": test_preds,
            "stage1_oof": cv1.oof_preds, "best_f1": f1, "threshold": thresh,
            "n_filtered": int((~survive).sum())}
