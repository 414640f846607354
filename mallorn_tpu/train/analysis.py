"""Analysis utilities (the reference's analyze_* / quick_comparison /
compare_all_experiments script family, SURVEY.md §4.4):

- feature-importance reports,
- train/test distribution drift checks per feature,
- experiment-result comparison tables,
- prediction-agreement matrices between submissions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd


def importance_report(names: Sequence[str], gains: np.ndarray,
                      top_k: int = 30) -> pd.DataFrame:
    """Ranked gain-importance table (reference train_v34a_bazin.py:224-247)."""
    df = pd.DataFrame({"feature": list(names),
                       "gain": np.asarray(gains, np.float64)})
    df["share"] = df["gain"] / max(df["gain"].sum(), 1e-12)
    return df.sort_values("gain", ascending=False).head(top_k).reset_index(drop=True)


def distribution_drift(X_train: np.ndarray, X_test: np.ndarray,
                       names: Sequence[str], top_k: int = 20) -> pd.DataFrame:
    """Per-feature mean/std drift between splits (reference
    adversarial_validation.py:205-234 and quick_distribution_check.py)."""
    rows = []
    for i, n in enumerate(names):
        a = X_train[:, i][np.isfinite(X_train[:, i])]
        b = X_test[:, i][np.isfinite(X_test[:, i])]
        if len(a) < 3 or len(b) < 3:
            continue
        mu_a, mu_b = a.mean(), b.mean()
        sd = max(a.std(), 1e-12)
        rows.append({"feature": n, "train_mean": mu_a, "test_mean": mu_b,
                     "shift_sigma": abs(mu_b - mu_a) / sd,
                     "train_nan_frac": 1 - len(a) / len(X_train),
                     "test_nan_frac": 1 - len(b) / len(X_test)})
    df = pd.DataFrame(rows)
    return df.sort_values("shift_sigma", ascending=False).head(top_k).reset_index(drop=True)


def compare_experiments(results: Dict[str, Dict]) -> pd.DataFrame:
    """Ledger table over experiment result dicts ({name: {oof_f1,
    threshold, ...}}) — the BENCHMARKS.md pattern as a function."""
    rows = []
    for name, r in results.items():
        rows.append({"experiment": name,
                     "oof_f1": r.get("oof_f1", np.nan),
                     "threshold": r.get("threshold", np.nan),
                     **{k: v for k, v in r.items()
                        if k not in ("oof_f1", "threshold")
                        and np.isscalar(v)}})
    return pd.DataFrame(rows).sort_values("oof_f1", ascending=False).reset_index(drop=True)


def prediction_agreement(preds: Dict[str, np.ndarray],
                         threshold: float = 0.5) -> pd.DataFrame:
    """Pairwise binary-agreement matrix between prediction vectors
    (reference compare_all_experiments.py behavior)."""
    names = list(preds)
    mat = np.zeros((len(names), len(names)))
    bins = {n: (np.asarray(p) > threshold) for n, p in preds.items()}
    for i, a in enumerate(names):
        for j, b in enumerate(names):
            mat[i, j] = (bins[a] == bins[b]).mean()
    return pd.DataFrame(mat, index=names, columns=names)
