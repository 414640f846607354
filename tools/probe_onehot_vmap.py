"""Minimal repro for the many-lane one-hot hist kernel fault.

vmaps build_histograms_pallas over L lanes at the exact v104 fit shapes
(8192 rows x 224 features, level-d segment counts) and runs one call per
(L, n_seg) case. Run SOLO.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.ops.hist_pallas import build_histograms_pallas

L = int(sys.argv[1]) if len(sys.argv) > 1 else 20
N, F = 8192, 224

rng = np.random.default_rng(0)


def run(n_nodes):
    n_seg = n_nodes * 257
    seg = jnp.asarray(
        rng.integers(0, n_seg + 1, size=(L, F, N)), jnp.int32)
    gh = jnp.asarray(rng.normal(size=(L, N, 2)), jnp.float32)

    fn = jax.jit(jax.vmap(
        lambda s, g: build_histograms_pallas(s, g, n_seg)))
    t0 = time.perf_counter()
    out = fn(seg, gh)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    # correctness spot check vs segment_sum on lane 0
    ref = jax.ops.segment_sum(
        np.asarray(gh[0]),
        np.asarray(jnp.where(seg[0, 0] >= n_seg, n_seg, seg[0, 0])),
        num_segments=n_seg + 1)[:-1]
    err = float(jnp.max(jnp.abs(out[0, 0] - ref)))
    print(f"L={L} n_nodes={n_nodes} n_seg={n_seg}: OK {dt:.2f}s "
          f"maxerr={err:.2e}", flush=True)


for n_nodes in (1, 2, 4, 8, 16):
    run(n_nodes)
print("ALL OK", flush=True)
