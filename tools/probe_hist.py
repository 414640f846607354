"""TPU probe harness: per-round GBDT cost + kernel MFU decomposition.

Methodology (see memory / PERF.md round 2): the boosting round is a
serial dependency chain, so per-op LATENCY is what matters — measure with
a chained ``lax.scan`` at two lengths and take the slope; synchronize via
a host transfer (block_until_ready is unreliable through the axon relay).
Run SOLO (one TPU process at a time; no concurrent pytest).

Usage:
  python tools/probe_hist.py fit      # per-round cost of _fit_impl variants
  python tools/probe_hist.py kernel   # single-call binlane bf16 vs int8
  python tools/probe_hist.py mfu      # print the analytic MFU table
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

# v5e peaks (public: 197 bf16 TFLOP/s, 394 int8 TOPS, 819 GB/s HBM)
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
PEAK_HBM = 819e9

# v92d shapes: 5 folds x [2464->2560 rows, 224 feats], 256 bins, depth 5
FOLDS, N_ROWS, N_FEAT, N_BINS, DEPTH = 5, 2560, 224, 256, 5


def _sync(x):
    import jax

    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def _scan_slope(fn, carry0, r1=6, r2=18, reps=3):
    """Per-iteration seconds of a chained scan body."""
    import jax
    import jax.numpy as jnp

    def make(r):
        @jax.jit
        def run(c):
            def body(c, _):
                return fn(c), None

            c, _ = jax.lax.scan(body, c, None, length=r)
            return c

        return run

    f1, f2 = make(r1), make(r2)
    _sync(f1(carry0)); _sync(f2(carry0))  # compile
    ts = []
    for f, r in ((f1, r1), (f2, r2)):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(f(carry0))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (r2 - r1)


def make_data(seed=0, folds=FOLDS, n=N_ROWS, f=N_FEAT):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    binned = jnp.asarray(rng.integers(0, N_BINS + 1, size=(folds, n, f)),
                         jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, size=(folds, n)), jnp.float32)
    w = jnp.ones((folds, n), jnp.float32)
    rid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (folds, n))
    keys = jnp.asarray(np.stack([
        np.asarray(jax.random.split(jax.random.PRNGKey(s), 600))
        for s in range(folds)]))
    return binned, y, w, rid, keys


def probe_fit(r1=8, r2=32):
    """Per-round cost of the fold-vmapped boosting scan, by variant.

    Times the REAL ``_fit_impl`` scan at two n_rounds and takes the slope
    — one-time costs (binlane precompute, dispatch) drop out."""
    import jax
    import jax.numpy as jnp

    from mallorn_tpu.trees import objectives
    from mallorn_tpu.trees.gbdt import GBDTParams, _fit_impl

    binned, y, w, rid, keys = make_data()
    results = {}
    for hist_dtype in ("i8bf16", "i8full"):
        for route in ("dynslice",):
            times = {}
            for r in (r1, r2):
                p = GBDTParams(n_rounds=r, max_depth=DEPTH, subsample=0.8,
                               colsample_bytree=0.8, hist_dtype=hist_dtype,
                               route=route, seed=0)

                def single(b, y_, w_, rid_, ks):
                    out = _fit_impl(
                        b, y_, w_, rid_, b[:1], y_[:1],
                        jnp.ones((1,), bool), ks,
                        p, objectives.logistic, False, None, 0)
                    return out[0].leaf_value.sum()

                fit = jax.jit(jax.vmap(single))
                ks = keys[:, :r]
                _sync(fit(binned, y, w, rid, ks))  # compile
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    _sync(fit(binned, y, w, rid, ks))
                    best = min(best, time.perf_counter() - t0)
                times[r] = best
            dt = (times[r2] - times[r1]) / (r2 - r1)
            results[f"{hist_dtype}/{route}"] = dt * 1e3
            print(f"  fit round [{hist_dtype}/{route}]: {dt * 1e3:.2f} "
                  f"ms/round  (t{r1}={times[r1]:.2f}s t{r2}={times[r2]:.2f}s)",
                  flush=True)
    return results


def probe_kernel():
    """Single-call binlane kernel latency by level width, bf16 vs int8."""
    import jax
    import jax.numpy as jnp

    from mallorn_tpu.ops import hist_pallas as hp

    rng = np.random.default_rng(0)
    nbt = N_BINS + 1
    n = N_ROWS * FOLDS  # flatten folds into rows for the raw-kernel probe
    f = N_FEAT
    binned = jnp.asarray(rng.integers(0, nbt, size=(f, n)), jnp.int32)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    h = jnp.abs(g) * 0.25 + 0.01

    bhot_bf, hib = hp.precompute_binlane(binned)
    bhot_i8, _ = hp.precompute_binlane_i8(binned)
    gd_bf = hp.split_gh_digits(g, h)
    gd_i8, s_g, s_h = hp.quantize_gh_i8(g, h)

    out = {}
    for n_nodes in (1, 4, 16):
        node_q = jnp.asarray(rng.integers(0, n_nodes + 1, size=n), jnp.int32)

        def time_call(kernel_fn, gd_arr, bhot_arr, r1=4, r2=12):
            # big operands as ARGUMENTS (jit-closure constants get baked
            # into the remote-compile payload -> HTTP 413); a carry-
            # dependent perturbation of gd serializes the chain
            def make(r):
                @jax.jit
                def run(bh, hi, nq, gd_a, c):
                    def body(c, _):
                        g2 = gd_a.at[0, 0].add((c * 1e-12).astype(gd_a.dtype))
                        hist = kernel_fn(bh, hi, nq, g2)
                        return c + hist[0, 0, 0, 0].astype(jnp.float32) * 1e-9, None

                    c, _ = jax.lax.scan(body, c, None, length=r)
                    return c

                return run

            f1, f2 = make(r1), make(r2)
            c0 = jnp.asarray(0.0, jnp.float32)
            args = (bhot_arr, hib, node_q, gd_arr)
            _sync(f1(*args, c0)); _sync(f2(*args, c0))
            ts = []
            for f, r in ((f1, r1), (f2, r2)):
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    _sync(f(*args, c0))
                    best = min(best, time.perf_counter() - t0)
                ts.append(best)
            return (ts[1] - ts[0]) / (r2 - r1)

        def k_bf(bh, hi, nq, gd_a):
            return hp.build_histograms_binlane(
                bh, hi, nq, gd_a, n_nodes, nbt, row_chunk=2560)

        def k_i8(bh, hi, nq, gd_a):
            return hp.build_histograms_binlane_i8(
                bh, hi, nq, gd_a, s_g, s_h, n_nodes, nbt, row_chunk=2560)

        def k_fh(bh, hi, nq, gd_a):
            return hp.build_histograms_fullhot(
                bh, nq, gd_a, n_nodes, nbt, row_chunk=2560)

        bhot_fh = hp.precompute_fullhot_i8(binned, nbt)
        for name, fn, gd_a, bh in (("bf16", k_bf, gd_bf, bhot_bf),
                                   ("int8", k_i8, gd_i8, bhot_i8),
                                   ("i8full", k_fh, gd_bf, bhot_fh)):
            dt = time_call(fn, gd_a, bh)
            out[f"{name}/nodes{n_nodes}"] = dt * 1e3
            print(f"  binlane[{name}] nodes={n_nodes}: {dt * 1e3:.2f} ms",
                  flush=True)
    return out


def probe_subtract(r1=8, r2=32):
    """A/B of hist_subtract at the two pipeline shapes (v92d: 2560 rows;
    adversarial: 11520 rows), i8bf16 dynslice."""
    import jax
    import jax.numpy as jnp

    from mallorn_tpu.trees import objectives
    from mallorn_tpu.trees.gbdt import GBDTParams, _fit_impl

    results = {}
    for shape_name, n in (("v92d", N_ROWS), ("adv", 11520)):
        binned, y, w, rid, keys = make_data(n=n)
        for sub in (False, True):
            times = {}
            for r in (r1, r2):
                p = GBDTParams(n_rounds=r, max_depth=DEPTH, subsample=0.8,
                               colsample_bytree=0.8, hist_dtype="i8bf16",
                               route="dynslice", seed=0, hist_subtract=sub)

                def single(b, y_, w_, rid_, ks):
                    out = _fit_impl(
                        b, y_, w_, rid_, b[:1], y_[:1],
                        jnp.ones((1,), bool), ks,
                        p, objectives.logistic, False, None, 0)
                    return out[0].leaf_value.sum()

                fit = jax.jit(jax.vmap(single))
                ks = keys[:, :r]
                _sync(fit(binned, y, w, rid, ks))  # compile
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    _sync(fit(binned, y, w, rid, ks))
                    best = min(best, time.perf_counter() - t0)
                times[r] = best
            dt = (times[r2] - times[r1]) / (r2 - r1)
            results[f"{shape_name}/sub={sub}"] = dt * 1e3
            print(f"  fit round [{shape_name}/sub={sub}]: {dt * 1e3:.2f} "
                  f"ms/round  (t{r1}={times[r1]:.2f}s t{r2}={times[r2]:.2f}s)",
                  flush=True)
    return results


def mfu_table(measured_ms: dict | None = None):
    """Analytic FLOPs/bytes per binlane call + achieved fraction of peak."""
    n, f = N_ROWS * FOLDS, N_FEAT
    rows = []
    for n_nodes in (1, 4, 16):
        n_bh = 3
        for name, bpe, digits, peak, lanes, cols in (
                ("bf16", 2, 6, PEAK_BF16, 128, n_nodes * n_bh),
                ("int8", 1, 8, PEAK_INT8, 128, n_nodes * n_bh),
                # i8full: full-bin one-hot, L = n_bh*128 lanes, node-only
                # column axis, bf16 digit matmul after in-kernel convert
                ("i8full", 1, 6, PEAK_BF16, n_bh * 128, n_nodes)):
            bytes_stream = f * n * lanes * bpe  # bhot from HBM
            flops = 2 * f * n * digits * cols * lanes  # M^T @ bhot
            t_hbm = bytes_stream / PEAK_HBM
            t_mxu = flops / peak
            key = f"{name}/nodes{n_nodes}"
            meas = (measured_ms or {}).get(key)
            rows.append({
                "kernel": key,
                "HBM_MB": round(bytes_stream / 1e6, 1),
                "GFLOP": round(flops / 1e9, 1),
                "floor_ms_hbm": round(t_hbm * 1e3, 2),
                "floor_ms_mxu": round(t_mxu * 1e3, 2),
                "measured_ms": None if meas is None else round(meas, 2),
                "pct_of_bound": None if meas is None else round(
                    100 * max(t_hbm, t_mxu) * 1e3 / meas, 1),
            })
    for r in rows:
        print(r, flush=True)
    return rows


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "mfu"
    res = {}
    if mode in ("fit", "all"):
        res["fit"] = probe_fit()
    if mode in ("sub", "all"):
        res["sub"] = probe_subtract()
    if mode in ("kernel", "all"):
        res["kernel"] = probe_kernel()
        res["mfu"] = mfu_table(res["kernel"])
    if mode == "mfu":
        mfu_table()
    out = Path(__file__).parent / f"probe_{mode}.json"
    out.write_text(json.dumps(res, indent=2, default=str))
    print(f"wrote {out}")
