"""Ablation probe for the per-round fit cost (run on TPU, solo).

The v92d fit measures ~17.6 ms/round while the 5 histogram kernel calls
account for ~10-11 ms; this decomposes the remainder by switching off
one per-round component at a time. Chained-scan slope with
host-transfer sync (see memory: block_until_ready is unreliable through
the axon relay).
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


def make_args(r, seed=0):
    rng = np.random.default_rng(seed)
    binned = jnp.asarray(rng.integers(0, 256, size=(FOLDS, N, F)), jnp.int16)
    y = jnp.asarray(rng.integers(0, 2, size=(FOLDS, N)), jnp.float32)
    w = jnp.ones((FOLDS, N), jnp.float32)
    rid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (FOLDS, N))
    bv = jnp.asarray(rng.integers(0, 256, size=(FOLDS, NV, F)), jnp.int16)
    yv = jnp.asarray(rng.integers(0, 2, size=(FOLDS, NV)), jnp.float32)
    vm = jnp.ones((FOLDS, NV), bool)
    keys = jnp.stack([jax.random.split(jax.random.PRNGKey(s), r)
                      for s in range(FOLDS)])
    return binned, y, w, rid, bv, yv, vm, keys


def time_variant(tag, params, has_val=True, r1=8, r2=24):
    ts = []
    for r in (r1, r2):
        p = params._replace(n_rounds=r)
        fit = _folds_executable(p, objectives.logistic, has_val, None, 0)
        args = make_args(r)
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
    out["full"] = time_variant("full (subsample+colsample+val)", base)
    out["no_sample"] = time_variant(
        "no row/col sampling", base._replace(subsample=1.0,
                                             colsample_bytree=1.0))
    out["no_val"] = time_variant("no val predict", base, has_val=False)
    out["no_binlane"] = time_variant(
        "per-level one-hot kernel", base._replace(use_binlane_hist=False))
    out["onehot_route"] = time_variant(
        "onehot routing", base._replace(route="onehot"))
    out["depth4"] = time_variant("depth 4", base._replace(max_depth=4))
    out["depth3"] = time_variant("depth 3", base._replace(max_depth=3))
    out["stub_hist"] = time_variant(
        "hist stubbed (non-hist chain)", base._replace(stub_hist=True))
    json_path = "/root/repo/tools/probe_ablate.json"
    with open(json_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
