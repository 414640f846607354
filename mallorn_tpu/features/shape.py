"""Lightcurve shape features: rise/fade times, asymmetry, durations,
power-law decay fits, cross-band peak-time statistics.

Masked-kernel re-design of reference src/features/lightcurve_shape.py.
Per-band features require >= 3 points (:192-198); the all-band block
requires >= 5 (:290). Semantics per function:

- rise_time (:34-65): first pre-peak point above 0.1*peak (fallback:
  first pre-peak point), NaN when nothing precedes the peak;
- fade_time_50/25 (:68-104): first post-peak point below frac*peak,
  else last point; NaN when nothing follows the peak;
- duration_50/25 (:147-161): time span of points above frac*max, 0 if none;
- power-law decay (:107-144): log-log polyfit on points > 5 d post-peak
  with positive flux (>= 5 required), dt floored at 1 d, flux at 1e-10;
- cross-band (:252-284): peak-time spread/std (ddof=0), optical (g,r,i)
  means and std/(mean+1e-6) consistencies;
- all-band aggregate (:287-330) incl. flux percentiles and concentration.
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M
from mallorn_tpu.utils.constants import LSST_BANDS

_BIG = 1.0e30


def _peak(t, f, mask):
    idx = M.argmax(f, mask)
    pt = jnp.take_along_axis(t, idx[..., None], -1)[..., 0]
    pf = jnp.take_along_axis(f, idx[..., None], -1)[..., 0]
    any_ = M.count(mask) > 0
    return jnp.where(any_, pt, jnp.nan), jnp.where(any_, pf, jnp.nan)


def _rise_time(t, f, mask, peak_t, peak_f, frac=0.1):
    """Reference compute_rise_time on time-sorted rows."""
    pre = mask & (t < peak_t[..., None])
    any_pre = jnp.any(pre, axis=-1)
    thr = frac * peak_f
    above = pre & (f > thr[..., None])
    any_above = jnp.any(above, axis=-1)
    # first (earliest) above-threshold pre-peak point; rows sorted by time
    idx_above = jnp.argmax(above, axis=-1)
    t_above = jnp.take_along_axis(t, idx_above[..., None], -1)[..., 0]
    # fallback: first pre-peak observation
    idx_first = jnp.argmax(pre, axis=-1)
    t_first = jnp.take_along_axis(t, idx_first[..., None], -1)[..., 0]
    rt = jnp.where(any_above, peak_t - t_above, peak_t - t_first)
    n = M.count(mask)
    ok = any_pre & (n >= 2) & ~jnp.isnan(peak_t)
    return jnp.where(ok, rt, jnp.nan)


def _fade_time(t, f, mask, peak_t, peak_f, frac):
    post = mask & (t > peak_t[..., None])
    any_post = jnp.any(post, axis=-1)
    thr = frac * peak_f
    below = post & (f < thr[..., None])
    any_below = jnp.any(below, axis=-1)
    idx_below = jnp.argmax(below, axis=-1)
    t_below = jnp.take_along_axis(t, idx_below[..., None], -1)[..., 0]
    t_last = M.mmax(jnp.where(post, t, -_BIG), post)
    ft = jnp.where(any_below, t_below - peak_t, t_last - peak_t)
    n = M.count(mask)
    ok = any_post & (n >= 2) & ~jnp.isnan(peak_t)
    return jnp.where(ok, ft, jnp.nan)


def _duration_above(t, f, mask, frac):
    peak_f = M.mmax(f, mask)
    above = mask & (f > frac * peak_f[..., None])
    any_above = jnp.any(above, axis=-1)
    span = M.mmax(t, above) - M.mmin(t, above)
    dur = jnp.where(any_above, span, 0.0)
    return jnp.where(M.count(mask) >= 2, dur, jnp.nan)


def _power_law_decay(t, f, mask, peak_t):
    sel = mask & (t > peak_t[..., None] + 5.0) & (f > 0)
    n_sel = jnp.sum(sel, axis=-1)
    dt = jnp.maximum(t - peak_t[..., None], 1.0)
    log_dt = jnp.log10(jnp.where(sel, dt, 1.0))
    log_f = jnp.log10(jnp.maximum(jnp.where(sel, f, 1.0), 1e-10))
    slope, intercept = M.linfit(log_dt, log_f, sel)
    pred = slope[..., None] * log_dt + intercept[..., None]
    resid = jnp.sqrt(M.mean((log_f - pred) ** 2, sel))
    ok = (n_sel >= 5) & ~jnp.isnan(peak_t)
    return jnp.where(ok, slope, jnp.nan), jnp.where(ok, resid, jnp.nan)


def _nan_agg(vals, min_n=2):
    """(mean, std ddof0, spread, n) over non-NaN along last axis."""
    m = ~jnp.isnan(vals)
    n = jnp.sum(m, axis=-1)
    mu = jnp.sum(jnp.where(m, vals, 0.0), -1) / jnp.maximum(n, 1)
    var = jnp.sum(jnp.where(m, (vals - mu[..., None]) ** 2, 0.0), -1) / jnp.maximum(n, 1)
    spread = M.mmax(vals, m) - M.mmin(vals, m)
    return mu, jnp.sqrt(var), spread, n


def _kernel(v: ObjectView) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, mask = v.band_time, v.band_flux, v.band_mask
    nb = M.count(mask)  # [6]
    band_ok = nb >= 3
    bm = mask & band_ok[:, None]

    peak_t, peak_f = _peak(t, f, bm)
    rise = _rise_time(t, f, bm, peak_t, peak_f)
    fade50 = _fade_time(t, f, bm, peak_t, peak_f, 0.5)
    fade25 = _fade_time(t, f, bm, peak_t, peak_f, 0.25)
    asym = jnp.where(~jnp.isnan(rise) & ~jnp.isnan(fade50) & (fade50 > 0),
                     rise / jnp.where(fade50 > 0, fade50, 1.0), jnp.nan)
    dur50 = _duration_above(t, f, bm, 0.5)
    dur25 = _duration_above(t, f, bm, 0.25)
    alpha, resid = _power_law_decay(t, f, bm, peak_t)

    per_band = {
        "rise_time": rise, "fade_time_50": fade50, "fade_time_25": fade25,
        "asymmetry": asym, "duration_50": dur50, "duration_25": dur25,
        "power_law_alpha": alpha, "power_law_residual": resid,
    }
    for bi, band in enumerate(LSST_BANDS):
        for name, vals in per_band.items():
            feats[f"{band}_{name}"] = jnp.where(band_ok[bi], vals[bi], jnp.nan)

    # cross-band peak-time stats over bands with >= 3 points
    pt = jnp.where(band_ok, peak_t, jnp.nan)
    _, pt_std, pt_spread, n_pt = _nan_agg(pt)
    feats["peak_time_spread"] = jnp.where(n_pt >= 2, pt_spread, jnp.nan)
    feats["peak_time_std"] = jnp.where(n_pt >= 2, pt_std, jnp.nan)

    # optical (g, r, i = indices 1..3) aggregates
    def _opt(vals):
        ov = vals[1:4]
        m = ~jnp.isnan(ov)
        n = jnp.sum(m)
        mu = jnp.sum(jnp.where(m, ov, 0.0)) / jnp.maximum(n, 1)
        var = jnp.sum(jnp.where(m, (ov - mu) ** 2, 0.0)) / jnp.maximum(n, 1)
        return jnp.where(n > 0, mu, jnp.nan), jnp.sqrt(var), n

    r_mu, r_sd, r_n = _opt(rise)
    f_mu, f_sd, f_n = _opt(fade50)
    a_mu, _, a_n = _opt(alpha)
    feats["optical_mean_rise_time"] = r_mu
    feats["optical_mean_fade_time"] = f_mu
    feats["optical_mean_power_alpha"] = jnp.where(a_n > 0, a_mu, jnp.nan)
    feats["rise_time_consistency"] = jnp.where(r_n >= 2, r_sd / (r_mu + 1e-6), jnp.nan)
    feats["fade_time_consistency"] = jnp.where(f_n >= 2, f_sd / (f_mu + 1e-6), jnp.nan)

    # all-band aggregate (>= 5 observations)
    at, af, am = v.all_time, v.all_flux, v.all_mask
    n_all = M.count(am)
    ok_all = n_all >= 5
    am_ok = am & ok_all

    pt_a, pf_a = _peak(at, af, am_ok)
    # all_rise_time scans rows in the reference's RAW CSV order — band-major
    # blocks, time-sorted within band (compute_rise_time never re-sorts,
    # :34-65, and the all-band block passes raw obj_lc arrays :287-293).
    # The flattened band view reproduces exactly that order.
    tfl = v.band_time.reshape(-1)
    ffl = v.band_flux.reshape(-1)
    mfl = v.band_mask.reshape(-1) & ok_all
    rise_a = _rise_time(tfl, ffl, mfl, pt_a, pf_a)
    fade_a = _fade_time(at, af, am_ok, pt_a, pf_a, 0.5)
    asym_a = jnp.where(~jnp.isnan(rise_a) & ~jnp.isnan(fade_a) & (fade_a > 0),
                       rise_a / jnp.where(fade_a > 0, fade_a, 1.0), jnp.nan)
    alpha_a, resid_a = _power_law_decay(at, af, am_ok, pt_a)

    feats["all_rise_time"] = jnp.where(ok_all, rise_a, jnp.nan)
    feats["all_fade_time_50"] = jnp.where(ok_all, fade_a, jnp.nan)
    feats["all_asymmetry"] = jnp.where(ok_all, asym_a, jnp.nan)
    feats["all_power_law_alpha"] = jnp.where(ok_all, alpha_a, jnp.nan)
    feats["all_power_law_residual"] = jnp.where(ok_all, resid_a, jnp.nan)

    for q, name in ((0.10, "flux_p10"), (0.25, "flux_p25"),
                    (0.75, "flux_p75"), (0.90, "flux_p90")):
        feats[name] = jnp.where(ok_all, M.quantile(af, am_ok, q), jnp.nan)

    total = M.msum(af, am_ok)
    conc = jnp.where(pf_a > 0, pf_a / (total + 1e-6), jnp.nan)
    feats["flux_concentration"] = jnp.where(ok_all, conc, jnp.nan)

    return feats


extract = vmap_features(_kernel)
