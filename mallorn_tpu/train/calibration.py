"""Probability calibration (reference scripts/calibrate_v11.py capability):
Platt scaling and isotonic regression over OOF predictions, plus
threshold-variant submission generation
(reference scripts/create_threshold_variants.py)."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def platt_scale(oof: np.ndarray, y: np.ndarray, preds: np.ndarray,
                n_iter: int = 200, lr: float = 0.1):
    """Fit sigmoid(a*logit(p)+b) on OOF, apply to preds."""
    eps = 1e-7
    z = np.log(np.clip(oof, eps, 1 - eps) / np.clip(1 - oof, eps, 1 - eps))
    a, b = 1.0, 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(a * z + b)))
        ga = np.mean((p - y) * z)
        gb = np.mean(p - y)
        a -= lr * ga
        b -= lr * gb
    zt = np.log(np.clip(preds, eps, 1 - eps) / np.clip(1 - preds, eps, 1 - eps))
    return 1.0 / (1.0 + np.exp(-(a * zt + b))), (a, b)


def isotonic_calibrate(oof: np.ndarray, y: np.ndarray, preds: np.ndarray):
    """Isotonic regression calibration (sklearn host-side)."""
    from sklearn.isotonic import IsotonicRegression

    iso = IsotonicRegression(out_of_bounds="clip")
    iso.fit(oof, y)
    return iso.predict(preds)


def threshold_variants(preds: np.ndarray,
                       thresholds: Sequence[float]) -> Dict[float, np.ndarray]:
    """Binary submissions at several thresholds (reference
    create_threshold_variants.py pattern)."""
    return {float(t): (preds > t).astype(int) for t in thresholds}
