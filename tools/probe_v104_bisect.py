"""Bisect the v104 50-lane TPU worker crash: lanes x kernel path.

Usage: python tools/probe_v104_bisect.py <case>
  case = "<N>seed[_onehot|_binlane|_bf16|_notest]"
  e.g. 4seed_binlane, 5seed, 10seed_onehot, 10seed_notest
"""

import os
import sys
import time
from pathlib import Path

os.environ["MALLORN_AOT_CACHE"] = "/tmp/aot_scratch2"
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

CASE = sys.argv[1] if len(sys.argv) > 1 else "2seed_binlane"


def main():
    from mallorn_tpu.train import pipelines

    z = np.load("/tmp/adv_mats.npz")
    X_tr, X_te, y = z["X_tr"], z["X_te"], z["y"]

    p = pipelines.V34A_PARAMS
    all_seeds = pipelines.V104_SEEDS
    n_seeds = int(CASE.split("seed")[0])
    seeds = all_seeds[:n_seeds]
    if "_onehot" in CASE:
        p = p._replace(use_binlane_hist=False)
    elif "_binlane" in CASE:
        p = p._replace(use_binlane_hist=True)
    if "_bf16" in CASE:
        p = p._replace(hist_dtype="bf16")
    if "_notest" in CASE:
        X_te = None

    t0 = time.perf_counter()
    oof, test_mean, f1s = pipelines.run_seed_ensemble(
        X_tr, y, X_te, params=p, seeds=seeds)
    print(f"CASE={CASE}: OK in {time.perf_counter() - t0:.1f}s, "
          f"per-seed F1 {sorted(round(v, 4) for v in f1s.values())}",
        flush=True)


if __name__ == "__main__":
    main()
