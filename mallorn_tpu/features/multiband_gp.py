"""Multi-band 2D GP features: hyperparameters + GP-interpolated colors.

TPU re-design of reference src/features/multiband_gp.py (the v19 winner
component): one batched GP fit over all objects replaces the 20-30 min
serial george/L-BFGS loop. Semantics preserved:

- data prep (:34-87): points with finite flux and err > 0; >= 10 required;
  times zeroed at the (filtered) minimum; flux/err normalized by the
  median |flux| of nonzero fluxes (fallback 1.0);
- features gp2d_amplitude/time_scale/wave_scale/log_likelihood/
  time_wave_ratio = ts/(ws/1000) (:169-188);
- peak anchor (:331-338): r-band argmax time minus the RAW time minimum
  (falls back to the global argmax when r is empty);
- GP-interpolated g/r/i fluxes at 0/20/50/100 d post-peak (denormalized),
  gp_gr/gp_ri colors (positive-flux guard), gr slopes at 50/100 d
  (:196-289).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mallorn_tpu.data.packing import PackedLightcurves
from mallorn_tpu.features.base import FeatureSet
from mallorn_tpu.ops import masked as M
from mallorn_tpu.ops.gp import fit_gp_batched, gp_predict
from mallorn_tpu.utils.constants import WAVELENGTHS_A

EPOCHS = (0, 20, 50, 100)
PRED_BANDS = ((1, "g"), (2, "r"), (3, "i"))


def extract(packed: PackedLightcurves, meta=None, n_steps: int = 100,
            chunk_size: int = 2048) -> FeatureSet:
    """Chunk the object axis so the [chunk, T, T] kernel/Cholesky buffers
    stay well inside HBM at the 10k-object scale.

    Objects are processed in *valid-count-sorted* order and each chunk's
    time axis is compacted (valid points gathered to the front) and
    truncated to the chunk's max count rounded up to a multiple of 64 —
    so a chunk of sparse objects pays a (T_c/T)^3 fraction of the full
    Cholesky cost instead of everyone paying the dataset-max T. Rounding
    to 64 keeps the set of compiled shapes SMALL (2 per dataset at
    competition scale, shared between train and test): each compiled
    gp2d executable is 18-28 MB, and the cold-start floor is the serial
    upload of every cached executable, so one fewer shape is worth more
    than the ~1.7x Cholesky premium the rounded-up chunks pay.
    """
    import numpy as np

    n = packed.n_objects
    T = packed.all_time.shape[1]

    af = np.asarray(packed.all_flux)
    ae = np.asarray(packed.all_err)
    am = np.asarray(packed.all_mask)
    counts = (am & np.isfinite(af) & np.isfinite(ae) & (ae > 0)).sum(1)

    from mallorn_tpu.utils.aot_cache import call_cached

    tc_global = min(T, int(np.ceil(max(int(counts.max(initial=1)), 32) / 64)
                           * 64))
    # the two-phase gate is decided ONCE from the dataset-global
    # compaction width so chunking (and chunk membership) never changes
    # which optimization path an object takes — features must be
    # chunk-invariant (test_sharded_chunked_extraction_matches_unchunked)
    two_phase = bool(tc_global > 1.5 * _T_COARSE and n_steps >= 30)
    if n <= chunk_size:
        return call_cached(_extract_chunk, (packed, n_steps, tc_global, two_phase),
                           tag="gp2d", static_argnums=(1, 2, 3))

    from mallorn_tpu.data.packing import pad_objects

    order = np.argsort(counts, kind="stable")
    outs = []
    for s in range(0, n, chunk_size):
        idx = order[s: s + chunk_size]
        sub = PackedLightcurves(
            *[x[idx] if hasattr(x, "ndim") and x.ndim >= 1 else x
              for x in packed[:-1]], time_offset=packed.time_offset)
        if len(idx) < chunk_size:
            sub = pad_objects(sub, chunk_size)
        tc = min(T, int(np.ceil(max(int(counts[idx].max()), 32) / 64) * 64))
        out = call_cached(_extract_chunk, (sub, n_steps, tc, two_phase),
                          tag="gp2d", static_argnums=(1, 2, 3))
        outs.append({k: v[: len(idx)] for k, v in out.items()})
    cat = {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}
    inv = np.argsort(order)  # undo the count sort
    return {k: v[inv] for k, v in cat.items()}


_T_COARSE = 64


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _extract_chunk(packed: PackedLightcurves, n_steps: int,
                   t_compact: int, two_phase: bool = None) -> FeatureSet:
    at, af, ae, ab, am = (packed.all_time, packed.all_flux, packed.all_err,
                          packed.all_band, packed.all_mask)
    n_obj = packed.n_objects

    use = am & jnp.isfinite(af) & jnp.isfinite(ae) & (ae > 0)
    n_use = jnp.sum(use, axis=1)
    ok = n_use >= 10

    # time origin over the FILTERED points (:75)
    t0f = M.mmin(at, use)
    t = jnp.where(use, at - t0f[:, None], 0.0)

    lam_table = jnp.asarray(WAVELENGTHS_A, jnp.float32)
    lam = jnp.where(use, lam_table[jnp.clip(ab, 0, 5)], 0.0)

    # flux scale: median |flux| over nonzero fluxes (:78-81)
    nz = use & (af != 0)
    scale = M.median(jnp.abs(af), nz)
    scale = jnp.where(jnp.isnan(scale) | (scale == 0), 1.0, scale)
    y = jnp.where(use, af / scale[:, None], 0.0)
    yerr = jnp.where(use, ae / scale[:, None], 1.0)

    if t_compact < t.shape[1]:
        # gather valid points to the front (stable -> order preserved)
        # and truncate: the GP only ever sees the `use` points
        perm = jnp.argsort(jnp.where(use, 0, 1), axis=1,
                           stable=True)[:, :t_compact]
        gather = lambda a: jnp.take_along_axis(a, perm, axis=1)
        t, lam, y, yerr, use = map(gather, (t, lam, y, yerr, use))

    T_COARSE = _T_COARSE
    if two_phase is None:  # direct callers: decide from this chunk alone
        two_phase = t_compact > 1.5 * T_COARSE and n_steps >= 30
    if two_phase:
        # two-phase optimization: the O(T^3) Cholesky chain dominates the
        # pipeline, but hyperparameters of a smooth Matern kernel are
        # statistically well-determined by an even ~64-point subsample.
        # Phase 1 runs the full Adam schedule on a STRIDED subset of each
        # lane's valid points (even time coverage; valid points are
        # compacted to the front); phase 2 refines at full resolution
        # from the warm start. Quality is gated by the scipy L-BFGS-B
        # oracle tests (test_gp_oracle_deep).
        pos = (jnp.arange(T_COARSE)[None, :]
               * jnp.maximum(n_use, 1)[:, None]) // T_COARSE  # [N, 64]
        first = jnp.concatenate(
            [jnp.ones((n_obj, 1), bool), pos[:, 1:] != pos[:, :-1]], axis=1)
        gat = lambda a: jnp.take_along_axis(a, pos, axis=1)
        use_c = gat(use) & first  # dedupe when a lane has < 64 points
        fit1 = fit_gp_batched(gat(t), gat(lam), gat(y), gat(yerr), use_c,
                              n_steps=n_steps)
        # phase-2 refinement: n_steps//6 (= 16 at the bench's 100).
        # Round 5 measured halving this to 8: ~0.4 s off warm extraction
        # but bench OOF F1 dropped 0.6702 -> 0.6614 AND the less-
        # converged params let f32 chunk-order rounding diverge the mesh
        # vs single-device feature matrices (0.6556 vs 0.6614) — the
        # scipy-oracle gate stayed green, so the gate alone is not
        # sufficient; the e2e F1 pins this constant. Reverted.
        fit = fit_gp_batched(t, lam, y, yerr, use,
                             n_steps=max(n_steps // 6, 8),
                             lr=0.05, lr_final=0.01, params0=fit1.params)
    else:
        fit = fit_gp_batched(t, lam, y, yerr, use, n_steps=n_steps)
    ok = ok & fit.valid

    mean_p, log_amp, log_lt2, log_lw2 = (fit.params[:, 0], fit.params[:, 1],
                                         fit.params[:, 2], fit.params[:, 3])
    amp = jnp.exp(log_amp)
    ts_ = jnp.sqrt(jnp.exp(log_lt2))
    ws_ = jnp.sqrt(jnp.exp(log_lw2))

    nan = jnp.nan
    feats: FeatureSet = {
        "gp2d_amplitude": jnp.where(ok, amp, nan),
        "gp2d_time_scale": jnp.where(ok, ts_, nan),
        "gp2d_wave_scale": jnp.where(ok, ws_, nan),
        "gp2d_log_likelihood": jnp.where(ok, fit.log_likelihood, nan),
        "gp2d_time_wave_ratio": jnp.where(ok, ts_ / (ws_ / 1000.0), nan),
    }

    # peak anchor: r-band argmax time minus RAW min time (:331-338)
    rt, rf, rm = packed.band_time[:, 2], packed.band_flux[:, 2], packed.band_mask[:, 2]
    has_r = M.count(rm) > 0
    r_peak_t = jnp.take_along_axis(rt, M.argmax(rf, rm)[:, None], 1)[:, 0]
    g_peak_t = jnp.take_along_axis(at, M.argmax(af, am)[:, None], 1)[:, 0]
    raw_min = M.mmin(at, am)
    peak_time = jnp.where(has_r, r_peak_t, g_peak_t) - raw_min
    # prediction grid is in the GP's (filtered-min-zeroed) time frame
    peak_in_gp = peak_time + raw_min - t0f

    t_star = peak_in_gp[:, None] + jnp.asarray(EPOCHS, jnp.float32)[None, :]
    t_star = jnp.repeat(t_star, len(PRED_BANDS), axis=1)  # [N, 4*3] epoch-major
    lam_star = jnp.tile(jnp.asarray([lam_table[b] for b, _ in PRED_BANDS]),
                        (n_obj, len(EPOCHS)))
    mu = gp_predict(fit.params, t, lam, y, yerr, use, t_star, lam_star)
    mu = mu * scale[:, None]  # denormalize

    flux = {}
    for ei, epoch in enumerate(EPOCHS):
        for pi, (bidx, bname) in enumerate(PRED_BANDS):
            v = mu[:, ei * len(PRED_BANDS) + pi]
            flux[(bname, epoch)] = v
            feats[f"gp_flux_{bname}_{epoch}d"] = jnp.where(ok, v, nan)
        g, r, i = (flux[("g", epoch)], flux[("r", epoch)], flux[("i", epoch)])
        gr_ok = ok & (g > 0) & (r > 0)
        ri_ok = ok & (r > 0) & (i > 0)
        feats[f"gp_gr_color_{epoch}d"] = jnp.where(
            gr_ok, -2.5 * jnp.log10(jnp.where(gr_ok, g, 1.0) / jnp.where(gr_ok, r, 1.0)), nan)
        feats[f"gp_ri_color_{epoch}d"] = jnp.where(
            ri_ok, -2.5 * jnp.log10(jnp.where(ri_ok, r, 1.0) / jnp.where(ri_ok, i, 1.0)), nan)

    gr0 = feats["gp_gr_color_0d"]
    gr50 = feats["gp_gr_color_50d"]
    gr100 = feats["gp_gr_color_100d"]
    feats["gp_gr_slope_50d"] = jnp.where(
        ~jnp.isnan(gr0) & ~jnp.isnan(gr50), (gr50 - gr0) / 50.0, nan)
    feats["gp_gr_slope_100d"] = jnp.where(
        ~jnp.isnan(gr0) & ~jnp.isnan(gr100), (gr100 - gr0) / 100.0, nan)
    return feats
