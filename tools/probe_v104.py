"""v104 seed-ensemble timing at competition scale on the real chip.

The reference's v104 runs 10 full 5-fold CVs sequentially; here all
50 (seed, fold) lanes train as ONE vmapped fit (binlane histograms
auto-disabled by the HBM gate at 50 lanes — the per-level one-hot
kernel carries it). Records wall time + ensemble OOF F1.

Run SOLO; scratch AOT dir (probe hygiene).
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["MALLORN_AOT_CACHE"] = "/tmp/aot_scratch"
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import bench
    from mallorn_tpu.train import pipelines
    from mallorn_tpu.train.cv import threshold_sweep

    z = np.load("/tmp/adv_mats.npz")
    X_tr, X_te, y = z["X_tr"], z["X_te"], z["y"]
    print(f"matrix: {X_tr.shape} train / {X_te.shape} test", flush=True)

    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        oof, test_mean, f1s = pipelines.run_seed_ensemble(
            X_tr, y, X_te, params=pipelines.V34A_PARAMS)
        dt = time.perf_counter() - t0
        f1, thr = threshold_sweep(y, oof, np.linspace(0.05, 0.5, 200))
        print(f"[{tag}] v104 (10 seeds x 5 folds, one vmapped fit): "
              f"{dt:.1f}s, ensemble OOF F1={f1:.4f} @ {thr:.3f}, "
              f"per-seed F1 range [{min(f1s.values()):.4f}, "
              f"{max(f1s.values()):.4f}]", flush=True)
    print(json.dumps({"v104_seconds_warm": round(dt, 1),
                      "oof_f1": round(f1, 4)}))


if __name__ == "__main__":
    main()
