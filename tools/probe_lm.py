"""Probe: Bazin LM extraction time vs n_iters at bench scale (VERDICT r3
weak #4 / #6 — the LM kernel is latency-bound on its serial damped
iterations; round 4 added a convergence-masked while_loop exit).

Run SOLO on the real chip (no AOT cache: fresh compiles per shape are
small and must not pollute the bench manifest):

    python tools/probe_lm.py

If warm time grows ~linearly in n_iters, no lane converges early (the
batched while_loop runs while ANY lane is alive); a flat tail means the
early exit is real.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.pop("MALLORN_AOT_CACHE", None)
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax

    sys.argv = [sys.argv[0]]
    import bench

    (tr_packed, tr_meta), (te_packed, te_meta) = bench.get_data()
    from mallorn_tpu.features import bazin

    def sync(x):
        jax.tree.map(lambda a: np.asarray(a), x)

    out = {}
    for n_iters in (60, 40, 30, 20, 10):
        # compile pass
        sync(bazin.extract(tr_packed, n_iters=n_iters))
        sync(bazin.extract(te_packed, n_iters=n_iters))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(bazin.extract(tr_packed, n_iters=n_iters))
            sync(bazin.extract(te_packed, n_iters=n_iters))
            times.append(time.perf_counter() - t0)
        out[n_iters] = round(float(np.median(times)), 3)
        print(f"n_iters={n_iters}: median {out[n_iters]:.3f}s "
              f"(passes {[round(t, 3) for t in times]})", flush=True)

    # quality proxy: reduced chi2 at reduced iters vs the 60-iter config
    # on the same lanes (the scipy gate itself lives in tests/test_bazin.py)
    ref = np.asarray(bazin.fit_all_bands(tr_packed,
                                         n_iters=60)["bazin_fit_chi2"]).ravel()
    for n_iters in (40, 30, 20):
        got = np.asarray(bazin.fit_all_bands(
            tr_packed, n_iters=n_iters)["bazin_fit_chi2"]).ravel()
        ok = np.isfinite(ref) & np.isfinite(got) & (ref > 0)
        ratio = got[ok] / ref[ok]
        frac_good = float((ratio <= 1.05).mean())
        print(f"chi2 vs 60-iter: n_iters={n_iters} "
              f"<=1.05x on {frac_good:.4f} of lanes "
              f"(median ratio {float(np.median(ratio)):.4f}, "
              f"p99 {float(np.quantile(ratio, 0.99)):.3f})", flush=True)
        out[f"chi2_frac_good_{n_iters}"] = frac_good

    print(json.dumps(out))


if __name__ == "__main__":
    main()
