"""Measure the REFERENCE pipeline's cost on THIS host (VERDICT r2 #2).

Round 2's "22.7x the reference" divided by a *published* ~900 s i7 number
(reference BENCHMARKS.md:323) — a different machine and real (vs
synthetic) data. This module replaces the quote with a measurement:

1. run the reference's OWN per-object extraction code (imported read-only
   from /root/reference/src — the same oracle-import the parity tests use,
   tests/conftest.py:49-57) over a SAMPLE of the identical synthetic bench
   objects, per feature family, and extrapolate per-object cost to the
   full 10,178 objects (sampling documented in the output);
2. train sklearn's HistGradientBoostingClassifier — an independently
   implemented histogram GBM — on the identical 222-column matrix as a
   model-quality oracle (the contract of reference
   scripts/train_v34a_bazin.py:167-174), reporting its OOF F1 for the
   |dF1| <= 0.02 parity gate.

The 2D-GP family is timed with the scipy L-BFGS-B oracle over an
independent NumPy implementation (george is absent from this image; the
oracle reproduces the reference's exact optimization setup —
multiband_gp.py:141-167, maxiter=100 — and omits the reference's GP
prediction step, so the GP number UNDERCOUNTS the reference's cost).

Results are cached in REFBASE.json; bench.py reads it to compute a
measured-on-this-host vs_baseline.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
REFERENCE_SRC = Path("/root/reference/src")
OUT = REPO / "REFBASE.json"

N_TOTAL_OBJECTS = 10178  # 3054 train + 7124 test (reference README.md:24-31)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _reference_frames(cols, meta):
    """Flat synthetic columns -> the reference CSV schema DataFrames."""
    import pandas as pd

    from mallorn_tpu.utils.constants import LSST_BANDS

    band_names = np.array(LSST_BANDS)
    lc = pd.DataFrame({
        "object_id": meta["object_ids"][cols["object_index"]],
        "Time (MJD)": cols["time"],
        "Flux": cols["flux"],
        "Flux_err": cols["flux_err"],
        "Filter": band_names[cols["band"]],
    })
    log = pd.DataFrame({"object_id": meta["object_ids"],
                        "Z": meta["z"], "EBV": meta["ebv"]})
    return lc, log


def _sample_frames(lc, log, object_ids, n, seed=0):
    rng = np.random.default_rng(seed)
    pick = rng.choice(object_ids, size=min(n, len(object_ids)), replace=False)
    lc_s = lc[lc["object_id"].isin(pick)]
    return lc_s, log[log["object_id"].isin(pick)], list(pick)


def _np_gp_nll(p, t, lam, y, yerr):
    """Independent NumPy marginal NLL of the reference's 2D Matern-3/2
    product GP with fitted constant mean (multiband_gp.py:123-167)."""
    mean, log_var, log_lt2, log_lw2 = p
    var = np.exp(log_var)
    lt = np.exp(0.5 * log_lt2)
    lw = np.exp(0.5 * log_lw2)

    def m32(d, l):
        q = np.sqrt(3.0) * np.abs(d) / l
        return (1.0 + q) * np.exp(-q)

    dt = t[:, None] - t[None, :]
    dl = lam[:, None] - lam[None, :]
    K = var * m32(dt, lt) * m32(dl, lw)
    K[np.diag_indices_from(K)] += yerr ** 2 + 1e-10
    L = np.linalg.cholesky(K)
    r = y - mean
    a = np.linalg.solve(L, r)
    return 0.5 * (a @ a) + np.log(np.diag(L)).sum() + 0.5 * len(y) * np.log(2 * np.pi)


def _time_gp_oracle(packed, sample_idx):
    """scipy L-BFGS-B (maxiter=100) per object — the reference optimizer."""
    from scipy.optimize import minimize

    from mallorn_tpu.utils.constants import WAVELENGTHS_A

    t0 = time.perf_counter()
    n_done = 0
    for i in sample_idx:
        at = np.asarray(packed.all_time[i], np.float64)
        af = np.asarray(packed.all_flux[i], np.float64)
        ae = np.asarray(packed.all_err[i], np.float64)
        ab = np.asarray(packed.all_band[i])
        am = np.asarray(packed.all_mask[i])
        use = am & np.isfinite(af) & np.isfinite(ae) & (ae > 0)
        if use.sum() < 10:
            continue
        t = at[use] - at[use].min()
        lam = np.asarray(WAVELENGTHS_A, np.float64)[np.clip(ab[use], 0, 5)]
        nz = af[use] != 0
        scale = np.median(np.abs(af[use][nz])) if nz.any() else 1.0
        y = af[use] / scale
        yerr = ae[use] / scale
        p0 = np.array([y.mean(), np.log(max(y.var(), 1e-8)),
                       2 * np.log(100.0), 2 * np.log(6000.0)])

        def f(p):
            try:
                return _np_gp_nll(p, t, lam, y, yerr)
            except np.linalg.LinAlgError:
                return 1e12

        minimize(f, p0, method="L-BFGS-B", options={"maxiter": 100})
        n_done += 1
    return time.perf_counter() - t0, n_done


def measure_reference_extraction(sample_main=200, sample_gp=40, seed=0):
    """Per-family per-object reference cost, measured then extrapolated."""
    sys.path.insert(0, str(REFERENCE_SRC))
    from features.bazin_fitting import extract_bazin_features
    from features.colors import extract_color_features
    from features.lightcurve_shape import extract_shape_features
    from features.physics_based import extract_physics_features
    from features.statistical import extract_statistical_features
    from features.tde_physics import extract_tde_physics_features

    from mallorn_tpu.data.packing import pack_lightcurves

    z = np.load(REPO / ".bench_data_v2.npz", allow_pickle=True)
    cols = {k: z[f"tr_{k}"] for k in
            ("object_index", "time", "flux", "flux_err", "band")}
    meta = {"object_ids": z["tr_object_ids"], "z": z["tr_z"],
            "ebv": z["tr_ebv"]}
    lc, log = _reference_frames(cols, meta)

    lc_s, log_s, ids = _sample_frames(lc, log, meta["object_ids"],
                                      sample_main, seed)
    _log(f"[ref] timing reference extraction on {len(ids)} sampled objects "
         f"(of {N_TOTAL_OBJECTS} total)...")

    timings = {}
    for fam, fn in (
        ("statistical", lambda: extract_statistical_features(lc_s, ids)),
        ("colors", lambda: extract_color_features(lc_s, ids)),
        ("shape", lambda: extract_shape_features(lc_s, ids)),
        ("physics", lambda: extract_physics_features(lc_s, log_s, ids)),
        ("tde_physics", lambda: extract_tde_physics_features(lc_s, ids)),
        ("bazin", lambda: extract_bazin_features(lc_s, ids)),
    ):
        t0 = time.perf_counter()
        df = fn()
        dt = time.perf_counter() - t0
        timings[fam] = {"seconds": dt, "n_objects": len(ids),
                        "per_object_ms": 1e3 * dt / len(ids),
                        "n_features": df.shape[1]}
        _log(f"[ref]   {fam}: {dt:.2f}s for {len(ids)} objects "
             f"({1e3 * dt / len(ids):.1f} ms/obj, {df.shape[1]} cols)")

    # 2D GP: scipy oracle (george absent; optimization only — undercounts)
    packed = pack_lightcurves(cols["object_index"], cols["time"],
                              cols["flux"], cols["flux_err"], cols["band"],
                              len(meta["object_ids"]))
    rng = np.random.default_rng(seed)
    gp_idx = rng.choice(len(meta["object_ids"]),
                        size=min(sample_gp, len(meta["object_ids"])),
                        replace=False)
    gp_dt, gp_n = _time_gp_oracle(packed, gp_idx)
    timings["multiband_gp_oracle"] = {
        "seconds": gp_dt, "n_objects": gp_n,
        "per_object_ms": 1e3 * gp_dt / max(gp_n, 1),
        "note": ("scipy L-BFGS-B maxiter=100 over independent NumPy NLL "
                 "(george absent; optimization only, no GP prediction — "
                 "undercounts the reference)")}
    _log(f"[ref]   multiband_gp(oracle): {gp_dt:.2f}s for {gp_n} objects "
         f"({1e3 * gp_dt / max(gp_n, 1):.1f} ms/obj)")

    total_per_obj_ms = sum(v["per_object_ms"] for v in timings.values())
    est_total_s = total_per_obj_ms * N_TOTAL_OBJECTS / 1e3
    return {
        "host": _host_info(),
        "families": timings,
        "per_object_ms_total": total_per_obj_ms,
        "extraction_seconds_est_10178": est_total_s,
        "method": (f"reference code timed on {len(ids)} sampled synthetic "
                   f"objects per family ({gp_n} for the GP), per-object "
                   f"cost x {N_TOTAL_OBJECTS} objects (train+test)"),
    }


def _host_info():
    import platform

    try:
        model = [l.split(":")[1].strip()
                 for l in open("/proc/cpuinfo") if "model name" in l][0]
    except Exception:
        model = platform.processor()
    import os

    return {"cpu": model, "n_cpus": os.cpu_count(),
            "platform": platform.platform()}


def sklearn_oracle(X_tr, y, names=None, seed=42):
    """Independent histogram-GBM quality oracle on the identical matrix.

    sklearn HistGradientBoostingClassifier with the reference training
    contract's shape (500 rounds, depth 5, lr 0.025, early stopping,
    imbalance handled via sample weight = scale_pos_weight on positives;
    reference scripts/train_v34a_bazin.py:134-174). Returns the OOF F1 at
    the swept threshold + wall time.
    """
    from sklearn.ensemble import HistGradientBoostingClassifier
    from sklearn.model_selection import StratifiedKFold

    from mallorn_tpu.train.cv import threshold_sweep

    X = np.asarray(X_tr, np.float64)
    y = np.asarray(y)
    t0 = time.perf_counter()
    oof = np.zeros(len(y))
    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=seed)
    for tr, va in skf.split(X, y):
        spw = (y[tr] == 0).sum() / max((y[tr] == 1).sum(), 1)
        w = np.where(y[tr] == 1, spw, 1.0)
        clf = HistGradientBoostingClassifier(
            max_iter=500, max_depth=5, learning_rate=0.025,
            l2_regularization=1.5, max_bins=255,
            early_stopping=True, n_iter_no_change=50,
            validation_fraction=0.15, random_state=seed)
        clf.fit(X[tr], y[tr], sample_weight=w)
        oof[va] = clf.predict_proba(X[va])[:, 1]
    dt = time.perf_counter() - t0
    f1, thr = threshold_sweep(y, oof, np.linspace(0.05, 0.5, 200))
    return {"oof_f1": float(f1), "threshold": float(thr),
            "train_seconds": dt, "n_features": int(X.shape[1])}


def main():
    res = {"measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
           "extraction": measure_reference_extraction()}
    OUT.write_text(json.dumps(res, indent=2))
    _log(f"[ref] wrote {OUT}: extraction est "
         f"{res['extraction']['extraction_seconds_est_10178']:.0f}s "
         f"for {N_TOTAL_OBJECTS} objects on this host")


if __name__ == "__main__":
    main()
