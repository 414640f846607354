"""Repro step 2: one-hot hist kernel inside lax.scan under many-lane vmap.

Mimics the fit's per-round call pattern (5 level calls, n_nodes
1,2,4,8,16) with a margin-like f32 carry. Run SOLO.

Usage: probe_onehot_scan.py [lanes] [rounds]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.ops.hist_pallas import build_histograms_pallas

L = int(sys.argv[1]) if len(sys.argv) > 1 else 20
R = int(sys.argv[2]) if len(sys.argv) > 2 else 50
N, F = 8192, 224

rng = np.random.default_rng(0)
binned_T = jnp.asarray(rng.integers(0, 257, size=(L, F, N)), jnp.int32)


def one_lane(bT):
    def round_step(margin, _):
        g = jnp.tanh(margin)
        h = jnp.maximum(1.0 - g * g, 1e-6)
        data = jnp.stack([g, h], -1)
        upd = 0.0
        for d in range(5):
            n_nodes = 2 ** d
            n_seg = n_nodes * 257
            # node assignment derived from the margin (data-dependent,
            # like the real fit's routing)
            node = (jnp.abs(margin * 1e3).astype(jnp.int32)) % n_nodes
            seg = jnp.where(
                (margin > -10.0)[None, :], node[None, :] * 257 + bT, n_seg)
            hist = build_histograms_pallas(seg.astype(jnp.int32), data, n_seg)
            upd = upd + hist[0, 0, 0] + hist[-1, -1, -1]
        return margin + 1e-3 * upd * jnp.ones_like(margin), upd

    margin0 = jnp.zeros(N, jnp.float32)
    _, ups = jax.lax.scan(round_step, margin0, None, length=R)
    return ups


fn = jax.jit(jax.vmap(one_lane))
t0 = time.perf_counter()
out = fn(binned_T)
out.block_until_ready()
print(f"L={L} R={R}: OK {time.perf_counter() - t0:.2f}s "
      f"sum={float(out.sum()):.3e}", flush=True)
