"""Serving-path latency/throughput probe.

Measures the deployed-inference story: features already cached (the
reference serves from cached features too), fold models loaded from the
model store, predict over the test split. Reports warm batch throughput
and single-object latency on the real chip.

Run SOLO (no concurrent TPU process); uses a scratch AOT dir so the
bench cache stays pristine (see memory: probe hygiene).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["MALLORN_AOT_CACHE"] = "/tmp/aot_scratch"
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax

    import bench
    from mallorn_tpu.train import pipelines
    from mallorn_tpu.train.cv import train_cv
    from mallorn_tpu.trees.gbdt import predict_proba_folds

    (tr_packed, tr_meta), (te_packed, te_meta) = bench.get_data()

    z = np.load("/tmp/adv_mats.npz")
    X_tr, X_te, y = z["X_tr"], z["X_te"], z["y"]

    # train the winning-config folds once (rounds trimmed: serving probe,
    # not a training benchmark)
    p = pipelines.V34A_PARAMS._replace(n_rounds=120)
    cv = train_cv(X_tr, y, X_te, p, early_stopping_rounds=50)
    models = cv.models

    def run(X):
        return predict_proba_folds(models, X)

    # warm the predict executable
    out = jax.block_until_ready(run(X_te))
    res = {}

    # batch throughput (full test split)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(X_te))
        ts.append(time.perf_counter() - t0)
    res["batch_rows"] = int(len(X_te))
    res["batch_s"] = min(ts)
    res["rows_per_s"] = len(X_te) / min(ts)

    # single-object latency (1-row batch, includes one host->device +
    # device->host round trip through the relay — the serving-floor)
    x1 = X_te[:1]
    jax.block_until_ready(run(x1))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x1))
        ts.append(time.perf_counter() - t0)
    res["single_object_ms"] = min(ts) * 1e3

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
