"""Bazin parametric lightcurve fits — all objects x 6 bands at once.

f(t) = A * exp(-(t-t0)/tau_fall) / (1 + exp(-(t-t0)/tau_rise)) + B

TPU re-design of the reference's serial per-(object, band) curve_fit loop
(reference: src/features/bazin_fitting.py): the ~61k bounded 5-parameter
NLLS problems run as one batched LM solve (ops/lm.py). Initialization,
bounds, weighting, parameter clipping, chi^2 and derived/cross-band
features match the reference exactly:

- init: A = f_peak - median, t0 = t_peak, B = median,
  tau_rise = 0.2*duration, tau_fall = 0.3*duration          (:95-105)
- bounds: A [0, 3 max], t0 [t_first, t_last],
  tau [0.1, duration], B [-max, 2 max]                       (:114-118)
- sigma weights: err if err > 0 else 1                       (:126)
- NaN row when n < 5 or the fit setup is infeasible
  (p0 outside bounds / empty bound box -> scipy raises)      (:76-87,168-179)
- clipping: A,B to ±1e6, tau to [0.1, 1e4], chi2 to [0,1e6]  (:141-151)
- derived: reduced chi2 (dof n-5), rise/fall ratio clip [0,100],
  peak flux A+B clip ±1e6                                    (:147-166)
- cross-band: rise/fall consistency over g,r,i (std/mean, >=2 valid),
  avg chi2 + dispersion over all bands                        (:215-249)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mallorn_tpu.data.packing import PackedLightcurves
from mallorn_tpu.features.base import FeatureSet
from mallorn_tpu.ops import masked as M
from mallorn_tpu.ops.lm import lm_fit_batched
from mallorn_tpu.utils.constants import LSST_BANDS, N_BANDS

PARAM_NAMES = ("bazin_A", "bazin_t0", "bazin_tau_rise", "bazin_tau_fall",
               "bazin_B")
FEATURE_NAMES = PARAM_NAMES + ("bazin_fit_chi2", "bazin_rise_fall_ratio",
                               "bazin_peak_flux")


def bazin_model(t, theta):
    """Numerically-stable Bazin evaluation (sigmoid form)."""
    A, t0, tau_rise, tau_fall, B = theta
    dt = t - t0
    decay = jnp.exp(jnp.clip(-dt / tau_fall, -60.0, 60.0))
    rise = jax.nn.sigmoid(dt / tau_rise)
    return A * decay * rise + B


def _setup(t, f, e, mask):
    """Per-lane init/bounds replicating reference :89-118. Lanes operate on
    [L, T] where L = N*6."""
    n = M.count(mask)
    peak_idx = M.argmax(f, mask)
    t_peak = jnp.take_along_axis(t, peak_idx[:, None], 1)[:, 0]
    f_peak = jnp.take_along_axis(f, peak_idx[:, None], 1)[:, 0]
    med = M.median(f, mask)
    t_first = M.mmin(t, mask)
    t_last = M.mmax(t, mask)
    duration = t_last - t_first
    max_flux = M.mmax(f, mask)

    theta0 = jnp.stack([
        f_peak - med,  # A
        t_peak,  # t0
        duration * 0.2,  # tau_rise
        duration * 0.3,  # tau_fall
        med,  # B
    ], axis=1)
    lb = jnp.stack([
        jnp.zeros_like(med), t_first,
        jnp.full_like(med, 0.1), jnp.full_like(med, 0.1),
        -max_flux,
    ], axis=1)
    ub = jnp.stack([
        3.0 * max_flux, t_last, duration, duration, 2.0 * max_flux,
    ], axis=1)

    # scipy curve_fit raises (-> NaN row in the reference) when any
    # lb >= ub or p0 lies outside the box; replicate that predicate.
    feasible = jnp.all(ub > lb, axis=1) & jnp.all(
        (theta0 >= lb) & (theta0 <= ub), axis=1)
    feasible &= n >= 5
    return theta0, lb, ub, feasible, n


def fit_all_bands(packed: PackedLightcurves, n_iters: int = 60,
                  n_starts: int = 4):
    """Run the batched fit. Returns per-lane dict of [N, 6] arrays.

    ``n_starts`` keeps the first k of the 4 multi-starts, ordered by
    measured marginal value (peak-anchored theta0, fast-transient s3,
    early-peak/slow-fall s2, mid-amplitude s4); the LM is latency-bound
    on its serial iterations with per-iteration cost linear in starts
    (tools/probe_lm.py)."""
    N = packed.n_objects
    T = packed.band_time.shape[-1]
    t = packed.band_time.reshape(N * N_BANDS, T)
    f = packed.band_flux.reshape(N * N_BANDS, T)
    e = packed.band_err.reshape(N * N_BANDS, T)
    mask = packed.band_mask.reshape(N * N_BANDS, T)

    theta0, lb, ub, feasible, n = _setup(t, f, e, mask)

    # Multi-start: the reference's single scipy-TRF run is matched/beaten
    # by 4 cheap batched starts (peak-anchored, early-peak/slow-fall,
    # fast-transient, mid-amplitude).
    dur = ub[:, 1] - lb[:, 1]
    s2 = theta0.at[:, 1].set(lb[:, 1] + 0.25 * dur)
    s2 = s2.at[:, 2].set(jnp.clip(0.05 * dur, 0.1, None))
    s2 = s2.at[:, 3].set(jnp.clip(0.6 * dur, 0.1, None))
    s3 = theta0.at[:, 2].set(jnp.clip(0.02 * dur, 0.1, None))
    s3 = s3.at[:, 3].set(jnp.clip(0.1 * dur, 0.1, None))
    s4 = theta0.at[:, 0].set(0.5 * (lb[:, 0] + ub[:, 0])).at[:, 4].set(0.0)
    starts = jnp.stack([theta0, s3, s2, s4][:n_starts])  # [S, L, P]

    res = lm_fit_batched(bazin_model, t, f, e, mask, starts, lb, ub,
                         n_iters=n_iters)

    ok = feasible & res.valid
    A = jnp.clip(res.theta[:, 0], -1e6, 1e6)
    t0 = res.theta[:, 1]
    tau_rise = jnp.clip(res.theta[:, 2], 0.1, 1e4)
    tau_fall = jnp.clip(res.theta[:, 3], 0.1, 1e4)
    B = jnp.clip(res.theta[:, 4], -1e6, 1e6)

    # reduced chi2 with the clipped params (reference recomputes residuals
    # post-clip, :148-151)
    sig = jnp.where(e > 0, e, 1.0)
    fitted = bazin_model(t.T, (A, t0, tau_rise, tau_fall, B)).T
    r = jnp.where(mask, (f - fitted) / sig, 0.0)
    chi2 = jnp.sum(r * r, axis=-1)
    red_chi2 = jnp.clip(chi2 / jnp.maximum(n - 5, 1), 0.0, 1e6)

    nan = jnp.nan
    out = {
        "bazin_A": jnp.where(ok, A, nan),
        "bazin_t0": jnp.where(ok, t0 + packed.time_offset, nan),
        "bazin_tau_rise": jnp.where(ok, tau_rise, nan),
        "bazin_tau_fall": jnp.where(ok, tau_fall, nan),
        "bazin_B": jnp.where(ok, B, nan),
        "bazin_fit_chi2": jnp.where(ok, red_chi2, nan),
        "bazin_rise_fall_ratio": jnp.where(
            ok, jnp.clip(tau_rise / (tau_fall + 1e-6), 0.0, 100.0), nan),
        "bazin_peak_flux": jnp.where(ok, jnp.clip(A + B, -1e6, 1e6), nan),
    }
    return {k: v.reshape(N, N_BANDS) for k, v in out.items()}


def _nanstd_mean_ratio(vals):
    """std/mean over non-NaN entries along axis 1; NaN when < 2 valid."""
    m = ~jnp.isnan(vals)
    n = jnp.sum(m, axis=1)
    mu = jnp.sum(jnp.where(m, vals, 0.0), axis=1) / jnp.maximum(n, 1)
    var = jnp.sum(jnp.where(m, (vals - mu[:, None]) ** 2, 0.0), axis=1) / jnp.maximum(n, 1)
    out = jnp.sqrt(var) / mu
    return jnp.where(n >= 2, out, jnp.nan)


def extract(packed: PackedLightcurves, meta=None, n_iters: int = 40,
            n_starts: int = 4) -> FeatureSet:
    """Routes through the persistent executable cache: the 61k-lane LM
    fit is the single biggest compile in the extraction path.

    Default n_iters=40 (was 60): measured at bench scale, 40 iterations
    keep 99.6% of lanes within 1.05x of the 60-iteration chi^2 (median
    ratio 1.0000, p99 1.012 — tools/probe_lm.py) while the LM cost is
    linear in the iteration cap; the scipy-parity gate
    (tests/test_bazin.py) is pinned independently at 80 iterations."""
    from mallorn_tpu.utils.aot_cache import call_cached

    return call_cached(_extract_jit, (packed, n_iters, n_starts),
                       tag="feat_bazin", static_argnums=(1, 2))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _extract_jit(packed: PackedLightcurves, n_iters: int,
                 n_starts: int = 4) -> FeatureSet:
    per_band = fit_all_bands(packed, n_iters=n_iters, n_starts=n_starts)

    feats: FeatureSet = {}
    for bi, band in enumerate(LSST_BANDS):
        for name in FEATURE_NAMES:
            feats[f"{band}_{name}"] = per_band[name][:, bi]

    # cross-band consistency over g, r, i (band indices 1, 2, 3)
    rise = per_band["bazin_tau_rise"][:, 1:4]
    fall = per_band["bazin_tau_fall"][:, 1:4]
    feats["bazin_rise_consistency"] = _nanstd_mean_ratio(rise)
    feats["bazin_fall_consistency"] = _nanstd_mean_ratio(fall)

    chi2 = per_band["bazin_fit_chi2"]  # [N, 6]
    m = ~jnp.isnan(chi2)
    n = jnp.sum(m, axis=1)
    mu = jnp.sum(jnp.where(m, chi2, 0.0), axis=1) / jnp.maximum(n, 1)
    var = jnp.sum(jnp.where(m, (chi2 - mu[:, None]) ** 2, 0.0), axis=1) / jnp.maximum(n, 1)
    feats["bazin_avg_fit_chi2"] = jnp.where(n > 0, mu, jnp.nan)
    feats["bazin_fit_quality_dispersion"] = jnp.where(n > 0, jnp.sqrt(var), jnp.nan)
    return feats
