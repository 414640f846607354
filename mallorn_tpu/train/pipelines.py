"""End-to-end training pipelines, one per reproduced reference config.

Each function mirrors one reference "version" script (SURVEY.md §5.6:
the versioned-script-per-experiment pattern becomes declarative pipeline
functions): baseline (statistical features), v34a (Bazin backbone),
v92d (winner: 222 features + adversarial weights), v104 (seed ensemble),
v55 (power-law), v42 (pseudo-label).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional, Tuple

import numpy as np

from mallorn_tpu.data.packing import Metadata, PackedLightcurves
from mallorn_tpu.features import statistical
from mallorn_tpu.features.base import feature_matrix
from mallorn_tpu.train.cv import CVResult, train_cv, threshold_sweep
from mallorn_tpu.trees.gbdt import GBDTParams

# The reference baseline's XGBoost config (reference:
# scripts/train_baseline.py:112-123): depth 6, lr 0.05, 500 rounds,
# subsample/colsample 0.8, scale_pos_weight.
BASELINE_PARAMS = GBDTParams(
    n_rounds=500, max_depth=6, learning_rate=0.05,
    subsample=0.8, colsample_bytree=0.8,
    min_child_weight=1.0, reg_alpha=0.0, reg_lambda=1.0,
)

# The v21/v34a/v92 config (reference: scripts/train_v34a_bazin.py:134-148).
V34A_PARAMS = GBDTParams(
    n_rounds=500, max_depth=5, learning_rate=0.025,
    subsample=0.8, colsample_bytree=0.8,
    min_child_weight=3.0, reg_alpha=0.2, reg_lambda=1.5,
)


@dataclasses.dataclass
class PipelineResult:
    cv: CVResult
    feature_names: list
    oof_f1: float
    threshold: float
    test_binary: Optional[np.ndarray]
    timings: Dict[str, float]


def _finite_or_nan(X: np.ndarray) -> np.ndarray:
    """±inf -> ±1e10, NaN preserved (reference:
    train_v92_focal_adversarial.py:102-103)."""
    return np.nan_to_num(X, nan=np.nan, posinf=1e10, neginf=-1e10)


def run_baseline(
    train_packed: PackedLightcurves,
    train_meta: Metadata,
    test_packed: Optional[PackedLightcurves] = None,
    test_meta: Optional[Metadata] = None,
    params: GBDTParams = BASELINE_PARAMS,
    verbose: bool = False,
) -> PipelineResult:
    """Statistical features + GBDT — the train_baseline.py equivalent.

    Baseline semantics: NaN/inf -> 0 before training (reference:
    train_baseline.py:89) and a fixed 0.5 threshold for fold F1s; we keep
    the OOF threshold sweep for the headline number like later versions.
    """
    timings: Dict[str, float] = {}
    t0 = time.perf_counter()
    feats = statistical.extract(train_packed, train_meta)
    X_train, names = feature_matrix(feats)
    X_train = np.nan_to_num(X_train, nan=0.0, posinf=0.0, neginf=0.0)

    X_test = None
    if test_packed is not None:
        tf = statistical.extract(test_packed, test_meta)
        X_test, _ = feature_matrix(tf, names)
        X_test = np.nan_to_num(X_test, nan=0.0, posinf=0.0, neginf=0.0)
    timings["features_s"] = time.perf_counter() - t0

    y = train_meta.target
    t0 = time.perf_counter()
    cv = train_cv(X_train, y, X_test, params, verbose=verbose)
    timings["train_s"] = time.perf_counter() - t0

    test_binary = None
    if cv.test_preds is not None:
        test_binary = (cv.test_preds > cv.best_threshold).astype(int)

    return PipelineResult(cv=cv, feature_names=names, oof_f1=cv.best_f1,
                          threshold=cv.best_threshold,
                          test_binary=test_binary, timings=timings)
