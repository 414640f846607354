"""Temperature-at-FWHM features (v59b): g-r color temperature sampled
at the r-band peak and half-max crossing times.

Masked-kernel re-design of the reference's script-level extractor
(reference: scripts/train_v59b_temp_at_fwhm.py:24-180). All 7 features
need g and r bands with >= 5 points and a positive r-band peak; NaN
otherwise. Semantics replicated exactly:

- r-band peak = argmax flux in time order; half = peak/2;
- rise/fall half-max times: the FIRST time-adjacent r-band pair
  straddling half (f_i < half <= f_{i+1} pre-peak; f_i >= half > f_{i+1}
  from the peak on), linearly interpolated (:100-126). Relies on the
  packer's per-band time ordering (data/packing.py lexsort);
- flux at a time: linear interpolation between the searchsorted
  neighbors, clamped to the end values, NaN when the nearest
  observation is > 10 d away (:45-66);
- temperature from g-r color: Wien-law calibration 7000 / (g-r + 0.6),
  clamped to 50000 K below g-r = -0.5 and 3000 K above 2.0, NaN for
  non-positive fluxes (:24-42);
- derived: temp_change_hm, temp_ratio_fall_rise (rise > 0),
  temp_drop_peak_to_hm, cooling_rate_to_hm (dt > 0) (:151-178).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M

_BIG = 1.0e30


def _temp_from_gr(gf, rf):
    bad = (gf <= 0) | (rf <= 0) | jnp.isnan(gf) | jnp.isnan(rf)
    g_r = -2.5 * jnp.log10(jnp.where(bad, 1.0, gf / rf))
    t = jnp.where(g_r < -0.5, 50000.0,
                  jnp.where(g_r > 2.0, 3000.0, 7000.0 / (g_r + 0.6)))
    return jnp.where(bad, jnp.nan, t)


def _flux_at_time(t, f, m, n, target, tolerance=10.0):
    """Reference find_flux_at_time: searchsorted neighbors, end-clamped,
    NaN when the nearest valid observation is > tolerance away."""
    d = jnp.where(m, jnp.abs(t - target), _BIG)
    far = jnp.min(d) > tolerance
    idx = jnp.sum(m & (t < target))  # searchsorted side='left'
    lo = jnp.clip(idx - 1, 0, t.shape[0] - 1)
    hi = jnp.clip(idx, 0, t.shape[0] - 1)
    t1, t2 = t[lo], t[hi]
    f1, f2 = f[lo], f[hi]
    w = (target - t1) / jnp.where(t2 == t1, 1.0, t2 - t1)
    interp = jnp.where(t2 == t1, f1, f1 + w * (f2 - f1))
    out = jnp.where(idx == 0, f[0], jnp.where(idx >= n, f[n - 1], interp))
    return jnp.where(far | jnp.isnan(target), jnp.nan, out)


def _first_cross(t, f, peak_idx, n, half, rising: bool):
    """First time-adjacent pair straddling half-max, interpolated."""
    i = jnp.arange(t.shape[0] - 1)
    f1, f2 = f[:-1], f[1:]
    t1, t2 = t[:-1], t[1:]
    if rising:
        cond = (i < peak_idx) & (f1 < half) & (f2 >= half)
    else:
        cond = (i >= peak_idx) & (i + 1 < n) & (f1 >= half) & (f2 < half)
    has = jnp.any(cond)
    first = jnp.argmax(cond)
    tc = t1[first] + (half - f1[first]) * (t2[first] - t1[first]) \
        / jnp.where(f2[first] == f1[first], 1.0, f2[first] - f1[first])
    return jnp.where(has, tc, jnp.nan)


def _kernel(v: ObjectView) -> FeatureSet:
    t, f, m = v.band_time, v.band_flux, v.band_mask
    tg, fg, mg = t[1], f[1], m[1]  # g
    tr, fr, mr = t[2], f[2], m[2]  # r
    ng, nr = M.count(mg), M.count(mr)

    fmax = M.mmax(fr, mr)
    # valid entries are a time-sorted prefix: argmax == first max in time
    peak_idx = jnp.argmax(jnp.where(mr, fr, -_BIG))
    peak_t = tr[peak_idx]
    ok = (ng >= 5) & (nr >= 5) & (fmax > 0)
    half = fmax / 2.0

    rise_t = _first_cross(tr, fr, peak_idx, nr, half, True)
    fall_t = _first_cross(tr, fr, peak_idx, nr, half, False)

    def temp_at(target):
        gf = _flux_at_time(tg, fg, mg, ng, target)
        rf = _flux_at_time(tr, fr, mr, nr, target)
        return _temp_from_gr(gf, rf)

    t_peak = temp_at(peak_t)
    t_rise = temp_at(rise_t)
    t_fall = temp_at(fall_t)

    change = t_fall - t_rise
    ratio = jnp.where(t_rise > 0, t_fall / jnp.where(t_rise > 0, t_rise, 1.0),
                      jnp.nan)
    drop = t_peak - t_fall
    dt = fall_t - peak_t
    cooling = jnp.where(dt > 0, (t_peak - t_fall) / jnp.where(dt > 0, dt, 1.0),
                        jnp.nan)

    feats: FeatureSet = {
        "temp_at_peak": t_peak,
        "temp_at_rise_hm": t_rise,
        "temp_at_fall_hm": t_fall,
        "temp_change_hm": change,
        "temp_ratio_fall_rise": ratio,
        "temp_drop_peak_to_hm": drop,
        "cooling_rate_to_hm": cooling,
    }
    return {k: jnp.where(ok, val, jnp.nan) for k, val in feats.items()}


extract = vmap_features(_kernel)
