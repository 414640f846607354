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


def _pairwise_complete_corr(X: np.ndarray) -> np.ndarray:
    """Pearson correlation with pandas' pairwise-complete-NaN semantics,
    as five [F, N] @ [N, F] matmuls instead of the O(F^2 N) Cython pair
    loop of ``DataFrame.corr`` (~10 s at 307 features x 3054 rows)."""
    M = np.isfinite(X)
    # center each column (pairwise Pearson is shift-invariant per column;
    # centering kills the catastrophic cancellation of n*sxy - sx*sy for
    # large-magnitude features like the 1e10 inf-clips)
    with np.errstate(invalid="ignore"):
        mu = np.where(M.any(0), np.nanmean(np.where(M, X, np.nan), axis=0), 0.0)
    V = np.where(M, X - mu, 0.0)
    Mf = M.astype(np.float64)
    V2 = V * V
    n = Mf.T @ Mf
    sx = V.T @ Mf
    sxy = V.T @ V
    sxx = V2.T @ Mf
    with np.errstate(invalid="ignore", divide="ignore"):
        cov = n * sxy - sx * sx.T
        var_x = n * sxx - sx * sx
        corr = cov / np.sqrt(var_x * var_x.T)
    corr[n < 2] = np.nan
    return corr


def correlation_prune(X: np.ndarray, names: Sequence[str],
                      threshold: float = 0.95) -> Tuple[pd.DataFrame, set]:
    corr = np.abs(_pairwise_complete_corr(np.asarray(X, dtype=np.float64)))
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


def _selection_digest(X: np.ndarray, y: np.ndarray, names: Sequence[str],
                      top_k: int, corr_threshold: float,
                      key_extra: str) -> str:
    import hashlib

    h = hashlib.sha1()
    h.update(np.ascontiguousarray(np.asarray(X, np.float32)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(y, np.float32)).tobytes())
    h.update("\x00".join(names).encode())
    h.update(f"|{top_k}|{corr_threshold}|{key_extra}".encode())
    return h.hexdigest()[:16]


def cached_select_features(
    cache_file, X: np.ndarray, y: np.ndarray, names: Sequence[str],
    importance_fn, top_k: int = 120, corr_threshold: float = 0.95,
    key_extra: str = "",
) -> SelectionResult:
    """Load-or-compute STAGED selection artifact.

    The reference computes feature selection ONCE and pickles it
    (reference: scripts/feature_selection.py:352-358 ->
    ``selected_features.pkl``); every training script then loads the
    pickle (e.g. scripts/train_v34a_bazin.py:59-68) — selection is a
    staged artifact, never a per-run cost. This is the npz equivalent,
    keyed by a content digest of (X, y, names, params) so a data or
    config change recomputes instead of silently reusing.

    ``importance_fn() -> [F] gains`` runs the selection CV only on a
    cache miss. ``key_extra``: digest of the fit config (rounds, params).
    """
    from pathlib import Path

    path = Path(cache_file)
    dig = _selection_digest(X, y, names, top_k, corr_threshold, key_extra)
    if path.exists():
        try:
            z = np.load(path, allow_pickle=False)
            if str(z["digest"]) == dig:
                imp_df = pd.DataFrame({
                    "feature": [n for n in z["imp_feature"]],
                    "gain": z["imp_gain"],
                    "normalized": z["imp_norm"],
                })
                pairs = pd.DataFrame({
                    "feature_1": list(z["pair_1"]),
                    "feature_2": list(z["pair_2"]),
                    "correlation": z["pair_corr"],
                })
                return SelectionResult(
                    selected=[n for n in z["selected"]],
                    dropped_correlated=[n for n in z["dropped"]],
                    importance=imp_df, high_corr_pairs=pairs)
        except Exception:
            pass  # stale/corrupt: recompute

    res = select_features(X, names, importance_fn(), top_k, corr_threshold)
    try:
        import os
        import tempfile

        path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz")
        os.close(fd)
        np.savez(
            tmp, digest=dig,
            selected=np.asarray(res.selected, dtype="U128"),
            dropped=np.asarray(res.dropped_correlated, dtype="U128"),
            imp_feature=res.importance["feature"].to_numpy(dtype="U128"),
            imp_gain=res.importance["gain"].to_numpy(),
            imp_norm=res.importance["normalized"].to_numpy(),
            pair_1=res.high_corr_pairs["feature_1"].to_numpy(dtype="U128"),
            pair_2=res.high_corr_pairs["feature_2"].to_numpy(dtype="U128"),
            pair_corr=res.high_corr_pairs["correlation"].to_numpy(np.float64),
        )
        os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    except Exception:
        pass  # artifact cache is best-effort
    return res
