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


def error_analysis(
    y: np.ndarray,
    oof_preds: np.ndarray,
    threshold: float,
    X: Optional[np.ndarray] = None,
    feature_names: Optional[Sequence[str]] = None,
    importance_gain: Optional[np.ndarray] = None,
    object_ids: Optional[np.ndarray] = None,
    z: Optional[np.ndarray] = None,
    spec_type: Optional[np.ndarray] = None,
    other_models: Optional[Dict[str, np.ndarray]] = None,
    top_k_features: int = 15,
    borderline_margin: float = 0.1,
) -> Dict[str, object]:
    """Per-object misclassification report — the v121 capability
    (reference: scripts/train_v121_error_analysis.py, and the hard-TDE
    accounting of train_v92_focal_adversarial.py:282-314).

    Returns a dict with:
      confusion        {tp, fp, fn, tn} counts at ``threshold``
      hard_tde_count   true TDEs with oof prob < 0.1 (near-hopeless misses)
      errors           DataFrame of every FN/FP object: object_id, group,
                       oof prob, margin to threshold, SpecType, Z
      group_stats      per-{TP,FN,FP,TN} mean of the top-importance
                       features + |FN-TP| relative gap (what distinguishes
                       the TDEs we miss from the ones we find)
      confidence       prob distribution stats per group + borderline count
      fn_recovery      (when ``other_models`` given) per-model: how many of
                       this model's FNs that model would recover at its own
                       best threshold, and how many are missed by ALL
    """
    from mallorn_tpu.train.cv import threshold_sweep

    y = np.asarray(y).astype(int)
    p = np.asarray(oof_preds, np.float64)
    pred = (p > threshold).astype(int)
    tp_i = np.where((pred == 1) & (y == 1))[0]
    fp_i = np.where((pred == 1) & (y == 0))[0]
    fn_i = np.where((pred == 0) & (y == 1))[0]
    tn_i = np.where((pred == 0) & (y == 0))[0]
    groups = {"TP": tp_i, "FN": fn_i, "FP": fp_i, "TN": tn_i}

    out: Dict[str, object] = {
        "confusion": {k.lower(): len(v) for k, v in
                      (("tp", tp_i), ("fp", fp_i), ("fn", fn_i), ("tn", tn_i))},
        # reference hard-TDE definition: true TDE scored below 0.1
        "hard_tde_count": int((p[y == 1] < 0.1).sum()),
    }

    def _col(a, idx, default=np.nan):
        if a is None:
            return np.full(len(idx), default)
        return np.asarray(a)[idx]

    err_idx = np.concatenate([fn_i, fp_i]).astype(int)
    out["errors"] = pd.DataFrame({
        "object_id": _col(object_ids, err_idx, -1),
        "row": err_idx,
        "group": ["FN"] * len(fn_i) + ["FP"] * len(fp_i),
        "oof_prob": p[err_idx],
        "margin": p[err_idx] - threshold,
        "spec_type": _col(spec_type, err_idx, ""),
        "z": _col(z, err_idx),
    }).sort_values(["group", "oof_prob"]).reset_index(drop=True)

    if X is not None and feature_names is not None:
        X = np.asarray(X, np.float64)
        order = (np.argsort(np.asarray(importance_gain))[::-1]
                 if importance_gain is not None else np.arange(X.shape[1]))
        feats = [feature_names[i] for i in order[:top_k_features]]
        rows = []
        for f in feats:
            j = list(feature_names).index(f)
            means = {g: (np.nanmean(X[idx, j]) if len(idx) else np.nan)
                     for g, idx in groups.items()}
            # gap in units of the TP-group spread (the reference divides by
            # |tp_mean|, which lets near-zero-mean noise dominate the rank)
            tp_sd = np.nanstd(X[tp_i, j]) if len(tp_i) else np.nan
            gap = abs(means["FN"] - means["TP"]) / (tp_sd + 1e-10)
            rows.append({"feature": f, **{f"{g.lower()}_mean": v
                                          for g, v in means.items()},
                         "fn_tp_gap": gap})
        out["group_stats"] = (pd.DataFrame(rows)
                              .sort_values("fn_tp_gap", ascending=False)
                              .reset_index(drop=True))

    conf = {g: {"n": len(idx),
                "mean": float(p[idx].mean()) if len(idx) else np.nan,
                "std": float(p[idx].std()) if len(idx) else np.nan}
            for g, idx in groups.items()}
    border = np.abs(p - threshold) < borderline_margin
    conf["borderline"] = {"n": int(border.sum()),
                          "tde": int(y[border].sum())}
    out["confidence"] = conf

    if other_models:
        rec = {}
        missed_by_all = np.ones(len(fn_i), bool)
        for name, mp in other_models.items():
            mp = np.asarray(mp, np.float64)
            _, t_m = threshold_sweep(y, mp)
            hit = mp[fn_i] > t_m
            rec[name] = int(hit.sum())
            missed_by_all &= ~hit
        rec["missed_by_all"] = int(missed_by_all.sum())
        out["fn_recovery"] = rec
    return out


def print_error_analysis(report: Dict[str, object], max_rows: int = 20) -> None:
    """Human-readable rendering of ``error_analysis`` (the reference prints
    this inline in v121/v92; here it is an explicit verbose path)."""
    c = report["confusion"]
    print(f"   confusion: TP={c['tp']} FP={c['fp']} FN={c['fn']} TN={c['tn']}"
          f" | hard TDEs (prob<0.1): {report['hard_tde_count']}", flush=True)
    errors: pd.DataFrame = report["errors"]  # type: ignore[assignment]
    if len(errors):
        print(f"   misclassified objects ({len(errors)}):", flush=True)
        print(errors.head(max_rows).to_string(index=False), flush=True)
    if "group_stats" in report:
        print("   top FN-vs-TP feature gaps:", flush=True)
        print(report["group_stats"].head(8).to_string(index=False), flush=True)
    if "fn_recovery" in report:
        print(f"   FN recovery by other models: {report['fn_recovery']}",
              flush=True)


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
