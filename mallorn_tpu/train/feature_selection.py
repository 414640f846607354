"""Feature selection: correlation pruning + importance ranking.

Mirrors reference scripts/feature_selection.py: absolute-correlation pairs
>= 0.95 (pandas pairwise-complete corr, :53-92), greedy drop of the
second feature of each pair (strongest correlations first), then rank the
survivors by normalized GBDT gain importance and keep the top K
(:95-161, 213-241). The reference averages XGB/LGBM/CatBoost importances;
this framework has one tree family, so its gain importances rank directly.

The output (`selected` names + artifacts) is the ``selected_120`` input of
the v34a pipeline (reference: scripts/train_v34a_bazin.py:59-68).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


@dataclasses.dataclass
class SelectionResult:
    selected: List[str]
    dropped_correlated: List[str]
    importance: pd.DataFrame  # feature, gain, normalized
    high_corr_pairs: pd.DataFrame


def correlation_prune(X: np.ndarray, names: Sequence[str],
                      threshold: float = 0.95) -> Tuple[pd.DataFrame, set]:
    df = pd.DataFrame(np.asarray(X, dtype=np.float64), columns=list(names))
    corr = df.corr().abs().to_numpy()
    iu = np.triu_indices(len(names), k=1)
    sel = corr[iu] >= threshold
    pairs = pd.DataFrame({
        "feature_1": np.asarray(names)[iu[0][sel]],
        "feature_2": np.asarray(names)[iu[1][sel]],
        "correlation": corr[iu][sel],
    }).sort_values("correlation", ascending=False)

    to_drop = set()
    for _, row in pairs.iterrows():
        if row["feature_1"] not in to_drop:
            to_drop.add(row["feature_2"])
    return pairs, to_drop


def select_features(X: np.ndarray, names: Sequence[str],
                    importance_gain: np.ndarray, top_k: int = 120,
                    corr_threshold: float = 0.95) -> SelectionResult:
    pairs, to_drop = correlation_prune(X, names, corr_threshold)
    imp = np.asarray(importance_gain, dtype=np.float64)
    imp_df = pd.DataFrame({
        "feature": list(names),
        "gain": imp,
        "normalized": imp / max(imp.sum(), 1e-12),
    }).sort_values("gain", ascending=False)
    clean = imp_df[~imp_df["feature"].isin(to_drop)]
    selected = clean.head(top_k)["feature"].tolist()
    return SelectionResult(selected=selected,
                           dropped_correlated=sorted(to_drop),
                           importance=imp_df, high_corr_pairs=pairs)
