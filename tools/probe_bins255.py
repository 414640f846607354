"""Per-round cost: n_bins=256 (n_bins_tot=257 -> 3 lane blocks of 128)
vs n_bins=255 (n_bins_tot=256 -> exactly 2 lane blocks).

The histogram kernels and the split-search cumulative scans all pad the
bin axis to 128-lane blocks; 257 total bins wastes a third block that is
>99% padding. LightGBM defaults to max_bin=255 for exactly this reason.
Chained-scan slope probe at the v92d fit shape. Run SOLO on the TPU.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mallorn_tpu.trees import objectives
from mallorn_tpu.trees.gbdt import GBDTParams, _folds_executable

FOLDS, N, NV, F = 5, 2560, 640, 224
DEPTH = 5


def _sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def make_args(r, n_bins, seed=0):
    rng = np.random.default_rng(seed)
    binned = jnp.asarray(rng.integers(0, n_bins + 1, size=(FOLDS, N, F)),
                         jnp.int16)
    y = jnp.asarray(rng.integers(0, 2, size=(FOLDS, N)), jnp.float32)
    w = jnp.ones((FOLDS, N), jnp.float32)
    rid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (FOLDS, N))
    bv = jnp.asarray(rng.integers(0, n_bins + 1, size=(FOLDS, NV, F)),
                     jnp.int16)
    yv = jnp.asarray(rng.integers(0, 2, size=(FOLDS, NV)), jnp.float32)
    vm = jnp.ones((FOLDS, NV), bool)
    keys = jnp.stack([jax.random.split(jax.random.PRNGKey(s), r)
                      for s in range(FOLDS)])
    return binned, y, w, rid, bv, yv, vm, keys


def time_variant(tag, params, r1=8, r2=24):
    ts = []
    for r in (r1, r2):
        p = params._replace(n_rounds=r)
        fit = _folds_executable(p, objectives.logistic, True, None, 0)
        args = make_args(r, p.n_bins)
        _sync(fit(*args))  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(fit(*args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (r2 - r1) * 1e3
    print(f"  {tag}: {dt:.2f} ms/round", flush=True)
    return dt


def main():
    base = GBDTParams(n_rounds=8, max_depth=DEPTH, subsample=0.8,
                      colsample_bytree=0.8, learning_rate=0.05)
    out = {}
    for hd in ("i8bf16", "i8full"):
        out[f"{hd}/bins256"] = time_variant(
            f"{hd} n_bins=256 (3 blocks)",
            base._replace(n_bins=256, hist_dtype=hd))
        out[f"{hd}/bins255"] = time_variant(
            f"{hd} n_bins=255 (2 blocks)",
            base._replace(n_bins=255, hist_dtype=hd))
    print(json.dumps(out))
    from pathlib import Path
    Path(__file__).parent.joinpath("probe_bins255.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
