"""Sweep (row_chunk, f_block) for the bin-lane histogram kernel.

The kernel is per-program-overhead-bound (~30-40 us/program against a
0.45-0.9 ms DMA floor per call), so fewer+fatter programs should win
until VMEM double-buffering bites. Measures the per-level call at the
shapes the pipeline actually pays, 5 folds vmapped (the fold axis
becomes a leading grid dim, exactly as in training):

  v92d/selection fit: 5 x [2560 rows x {224, 416} feats]  (rows pad x512)
  adversarial fit:    5 x [8192 rows x 224 feats], depth 3

Methodology: chained lax.scan slope (see tools/probe_hist.py) — the
axon relay adds ~90 ms to any single host sync, so single-call timing
is meaningless here. Run SOLO on the TPU.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from mallorn_tpu.ops import hist_pallas

N_BINS_TOT = 257


def _sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def _scan_slope(fn, carry0, consts, r1=4, r2=12, reps=3):
    """fn(carry, *consts) -> carry; consts enter as jit ARGS (a closed-over
    device array becomes an HLO constant and overflows the remote-compile
    upload on this environment)."""
    def make(r):
        @jax.jit
        def run(c, *a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = jax.lax.scan(body, c, None, length=r)
            return c
        return run

    f1, f2 = make(r1), make(r2)
    _sync(f1(carry0, *consts)); _sync(f2(carry0, *consts))
    ts = []
    for f, r in ((f1, r1), (f2, r2)):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(f(carry0, *consts))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (r2 - r1)


def bench_shape(tag, folds, n, f, nodes_list, rc_list, fb_list, out):
    rng = np.random.default_rng(0)
    binned_T = jnp.asarray(rng.integers(0, N_BINS_TOT, size=(folds, f, n)),
                           jnp.int32)
    gd0 = jnp.asarray(rng.standard_normal((folds, n, 6)), jnp.bfloat16)

    bh, hib = jax.jit(jax.vmap(hist_pallas.precompute_binlane_i8))(binned_T)
    bh = jax.block_until_ready(bh)

    for nodes in nodes_list:
        node_q = jnp.asarray(rng.integers(0, nodes + 1, size=(folds, n)),
                             jnp.int32)
        for rc in rc_list:
            if n % rc:
                continue
            for fb in fb_list:
                def level(gd, bh, hib, node_q, rc=rc, fb=fb, nodes=nodes):
                    def one(b1, h1, nq1, g1):
                        return hist_pallas.build_histograms_binlane(
                            b1, h1, nq1, g1, nodes, N_BINS_TOT,
                            row_chunk=rc, f_block=fb)
                    h = jax.vmap(one)(bh, hib, node_q, gd)
                    # serialize the chain: feed a hist-dependent epsilon back
                    eps = (h[0, 0, 0, 0, 0] * 1e-30).astype(gd.dtype)
                    return gd + eps

                key = f"{tag}/nodes{nodes}/rc{rc}/fb{fb}"
                try:
                    t = _scan_slope(level, gd0, (bh, hib, node_q))
                except Exception as e:
                    print(f"  {key}: FAILED {type(e).__name__}", flush=True)
                    continue
                programs = folds * (-(-f // fb)) * (n // rc)
                out[key] = t * 1e3
                print(f"  {key}: {t * 1e3:.2f} ms ({programs} programs)",
                      flush=True)
                with open("/root/repo/tools/probe_sweep.json", "w") as fjs:
                    json.dump(out, fjs, indent=2)


def main():
    res = {}
    # v92d fit shape: 5 folds x [2560 rows, 224 features]
    bench_shape("v92d", 5, 2560, 224, [1, 16], [1280, 2560], [16, 32, 64],
                res)
    # adversarial fit shape: 5 folds x [8192 rows, 224 features], depth 3
    bench_shape("adv", 5, 8192, 224, [1, 4], [1024, 2048, 4096, 8192],
                [32, 64], res)
    # selection fit shape: 5 folds x [2560 rows, 416 features]
    bench_shape("sel", 5, 2560, 416, [16], [1280, 2560], [16, 32, 64], res)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
