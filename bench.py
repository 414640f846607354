"""Benchmark: end-to-end pipeline at competition scale on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Workload (matches the reference's dataset scale, README.md:24-31):
10,178 synthetic objects (3,054 train / 7,124 test), 6 bands ->
batched feature extraction (train+test) -> 5-fold GBDT (v34a config,
500 rounds, early stopping) -> test predictions.

vs_baseline compares against the reference CPU pipeline time of ~900 s
(~15 min for the v34a feature+train pipeline on an i7, BENCHMARKS.md:323).
Values > 1 mean faster than the reference.

All progress goes to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REF_PIPELINE_SECONDS = 900.0
N_TRAIN, N_TEST = 3054, 7124

CACHE = Path(__file__).parent / ".bench_data.npz"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def get_data():
    from mallorn_tpu.data.packing import Metadata, pack_lightcurves
    from mallorn_tpu.data.synthetic import generate_dataset

    if CACHE.exists():
        z = np.load(CACHE, allow_pickle=True)
        cols = {k: z[k] for k in ("object_index", "time", "flux", "flux_err", "band")}
        meta_all = Metadata(object_ids=z["object_ids"], z=z["z"], ebv=z["ebv"],
                            target=z["target"])
    else:
        log("generating synthetic dataset (one-time, cached)...")
        _, meta_all, cols = generate_dataset(N_TRAIN + N_TEST, seed=20260816,
                                             tde_frac=0.05)
        np.savez_compressed(CACHE, object_ids=meta_all.object_ids, z=meta_all.z,
                            ebv=meta_all.ebv, target=meta_all.target, **cols)

    n_all = N_TRAIN + N_TEST
    is_train_obj = np.zeros(n_all, bool)
    is_train_obj[:N_TRAIN] = True

    def subset(keep_obj):
        idx_map = -np.ones(n_all, np.int64)
        ids = np.where(keep_obj)[0]
        idx_map[ids] = np.arange(len(ids))
        keep = keep_obj[cols["object_index"]]
        packed = pack_lightcurves(
            idx_map[cols["object_index"][keep]], cols["time"][keep],
            cols["flux"][keep], cols["flux_err"][keep], cols["band"][keep],
            len(ids))
        meta = Metadata(object_ids=meta_all.object_ids[ids], z=meta_all.z[ids],
                        ebv=meta_all.ebv[ids], target=meta_all.target[ids])
        return packed, meta

    return subset(is_train_obj), subset(~is_train_obj)


def main():
    import jax

    log(f"devices: {jax.devices()}")
    (tr_packed, tr_meta), (te_packed, te_meta) = get_data()

    from mallorn_tpu.features import statistical
    from mallorn_tpu.features.base import feature_matrix
    from mallorn_tpu.train.cv import train_cv
    from mallorn_tpu.train.pipelines import V34A_PARAMS

    t0 = time.perf_counter()

    feats_tr = statistical.extract(tr_packed, tr_meta)
    X_tr, names = feature_matrix(feats_tr)
    feats_te = statistical.extract(te_packed, te_meta)
    X_te, _ = feature_matrix(feats_te, names)
    X_tr = np.nan_to_num(X_tr, nan=np.nan, posinf=1e10, neginf=-1e10)
    X_te = np.nan_to_num(X_te, nan=np.nan, posinf=1e10, neginf=-1e10)
    t_feat = time.perf_counter() - t0
    log(f"feature extraction ({X_tr.shape[1]} features, "
        f"{N_TRAIN + N_TEST} objects): {t_feat:.2f}s")

    t1 = time.perf_counter()
    cv = train_cv(X_tr, tr_meta.target, X_te, V34A_PARAMS,
                  early_stopping_rounds=50, verbose=False)
    t_train = time.perf_counter() - t1
    log(f"5-fold GBDT train+predict: {t_train:.2f}s, OOF F1={cv.best_f1:.4f} "
        f"@ {cv.best_threshold:.3f}")

    total = time.perf_counter() - t0
    print(json.dumps({
        "metric": "e2e_pipeline_seconds_10178obj",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(REF_PIPELINE_SECONDS / total, 2),
    }))


if __name__ == "__main__":
    main()
