"""Full-graph serving throughput probe (the flagship entry() path).

Round 3 measured 9,600 obj/s for the cached-features serving shape
(tools/probe_serving.py — fold models over a precomputed matrix, the
reference's own serving story). This probe measures the NEW flagship
graph (VERDICT r4 weak #3): raw packed lightcurves -> full v92d
222-feature extraction (features_v4 + TDE + 2D-GP + Bazin LM) ->
binning -> forest margin -> probability, ONE fused executable — i.e.
serving when no feature cache exists yet.

Run SOLO on the real chip; scratch AOT dir (probe hygiene).
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["MALLORN_AOT_CACHE"] = "/tmp/aot_scratch"
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

BATCH = 2048  # production serving batch (one GP chunk)


def main():
    import jax

    import __graft_entry__ as ge

    t0 = time.perf_counter()
    fn, (packed, z, ebv) = ge._build_flagship(n_objects=BATCH, gp_steps=8)
    print(f"build+train (eager, {BATCH} objects): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    fwd = jax.jit(fn)
    t0 = time.perf_counter()
    out = np.asarray(fwd(packed, z, ebv))
    print(f"first call (compile): {time.perf_counter() - t0:.1f}s, "
          f"probs[:4]={out[:4].round(3)}", flush=True)
    assert out.shape == (BATCH,) and np.isfinite(out).all()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(fwd(packed, z, ebv))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    res = {
        "batch": BATCH,
        "warm_seconds_median": round(med, 3),
        "warm_seconds": [round(t, 3) for t in times],
        "objects_per_second": round(BATCH / med, 0),
        "ms_per_object_batched": round(med / BATCH * 1e3, 3),
    }
    print(json.dumps(res), flush=True)
    (Path(__file__).parent / "probe_serving_full.json").write_text(
        json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
