"""FWHM features (v58): interpolated full-width-at-half-maximum.

Masked-kernel re-design of the reference's script-level extractor
(reference: scripts/train_v58_fwhm.py:37-180). Per band (>= 5 points,
positive peak flux; NaN otherwise):

- peak = first max-flux point in time order (:60-63);
- rise_hwhm (:68-103): on the pre-peak side (t <= peak_t, >= 2 points),
  if every point is already above half-max, peak_t - t_first; if the
  side crosses half-max, linearly interpolate the crossing time between
  the latest point strictly before the earliest above-half point and
  that point — NaN when the earliest above-half point is the side's
  first point (the script's cross_idx == 0 branch) or the pair has
  equal fluxes;
- fall_hwhm (:106-126): mirror logic on t >= peak_t with the earliest
  below-half point;
- fwhm = rise + fall (both valid), fwhm_asymmetry = fall / rise when
  rise > 0 (:129-146);
- aggregates over bands with a valid fwhm: mean/std (ddof=0)/max/min,
  g/r and r/i ratios (denominator > 0), mean asymmetry (:149-180).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M
from mallorn_tpu.utils.constants import LSST_BANDS

_BIG = 1.0e30


def _interp_cross(t1, f1, t2, f2, half):
    t_cross = t1 + (half - f1) * (t2 - t1) / jnp.where(f2 == f1, 1.0, f2 - f1)
    return jnp.where(f2 == f1, jnp.nan, t_cross)


def _hwhm_side(t, f, m, peak_i, peak_t, half, rising: bool):
    """One side's HWHM by INDEX adjacency on the time-sorted valid prefix.

    The reference slices the rise/fall arrays by array position and takes
    ``cross_idx - 1`` as the pre-crossing point (train_v58_fwhm.py:84-103);
    packing keeps each band's valid points in a contiguous time-sorted
    prefix, so index order here equals the reference's sorted order (up to
    pandas' unstable quicksort on exactly-duplicate timestamps, where the
    reference's own ordering is unspecified)."""
    idx = jnp.arange(t.shape[0])
    side = m & ((idx <= peak_i) if rising else (idx >= peak_i))
    n_side = jnp.sum(side)
    above = side & (f >= half)
    target = above if rising else (side & (f < half))
    n_above = jnp.sum(above)

    # all points above half-max -> span to the side's extremum (the band's
    # first valid point / last valid point — the prefix is contiguous)
    last_i = jnp.maximum(jnp.sum(m) - 1, 0)
    all_above = (peak_t - t[0]) if rising else (t[last_i] - peak_t)

    # crossing: first target index vs the ARRAY-ADJACENT previous point
    # (reference: rise_fluxes[cross_idx - 1]; requires cross_idx > 0 within
    # the side, i.e. a previous point exists on this side)
    ci = jnp.argmax(target)  # first True (side is an index range)
    has_target = jnp.any(target)
    has_prev = ci > (0 if rising else peak_i)
    pi = jnp.maximum(ci - 1, 0)
    t_cross = _interp_cross(t[pi], f[pi], t[ci], f[ci], half)
    crossed = (peak_t - t_cross) if rising else (t_cross - peak_t)
    crossed = jnp.where(has_prev, crossed, jnp.nan)

    mixed = has_target & (n_above > 0) & (n_above < n_side)
    out = jnp.where(mixed, crossed,
                    jnp.where(n_above == n_side, all_above, jnp.nan))
    return jnp.where(n_side >= 2, out, jnp.nan)


def _kernel(v: ObjectView) -> FeatureSet:
    t, f, m = v.band_time, v.band_flux, v.band_mask  # [6, T]
    ok = M.count(m) >= 5  # [6]

    fmax = M.mmax(f, m)
    at_peak = m & (f == fmax[:, None])
    # first max-flux INDEX (= reference np.argmax after the time sort;
    # the valid prefix is time-sorted so this is also first-in-time)
    peak_i = jnp.argmax(at_peak, axis=-1)  # [6]
    peak_t = jnp.take_along_axis(t, peak_i[:, None], axis=-1)[:, 0]  # [6]
    valid = ok & (fmax > 0)
    half = fmax / 2.0

    rise = jnp.stack([
        _hwhm_side(t[b], f[b], m[b], peak_i[b], peak_t[b], half[b], True)
        for b in range(6)])
    fall = jnp.stack([
        _hwhm_side(t[b], f[b], m[b], peak_i[b], peak_t[b], half[b], False)
        for b in range(6)])
    rise = jnp.where(valid, rise, jnp.nan)
    fall = jnp.where(valid, fall, jnp.nan)

    both = ~jnp.isnan(rise) & ~jnp.isnan(fall)
    fwhm = jnp.where(both, rise + fall, jnp.nan)
    asym = jnp.where(both & (rise > 0), fall / jnp.where(rise > 0, rise, 1.0),
                     jnp.nan)

    feats: FeatureSet = {}
    for bi, band in enumerate(LSST_BANDS):
        feats[f"{band}_rise_hwhm"] = rise[bi]
        feats[f"{band}_fall_hwhm"] = fall[bi]
        feats[f"{band}_fwhm"] = fwhm[bi]
        feats[f"{band}_fwhm_asymmetry"] = asym[bi]

    # aggregates over bands with a valid fwhm
    fv = ~jnp.isnan(fwhm)
    nf = jnp.sum(fv)
    mu = jnp.sum(jnp.where(fv, fwhm, 0.0)) / jnp.maximum(nf, 1)
    var = jnp.sum(jnp.where(fv, (fwhm - mu) ** 2, 0.0)) / jnp.maximum(nf, 1)
    any_f = nf > 0
    feats["fwhm_mean"] = jnp.where(any_f, mu, jnp.nan)
    feats["fwhm_std"] = jnp.where(any_f, jnp.sqrt(var), jnp.nan)
    feats["fwhm_max"] = jnp.where(any_f, jnp.max(jnp.where(fv, fwhm, -_BIG)),
                                  jnp.nan)
    feats["fwhm_min"] = jnp.where(any_f, jnp.min(jnp.where(fv, fwhm, _BIG)),
                                  jnp.nan)

    def _ratio(num, den):
        okr = fv[num] & fv[den] & (fwhm[den] > 0)
        return jnp.where(okr, fwhm[num] / jnp.where(okr, fwhm[den], 1.0),
                         jnp.nan)

    feats["fwhm_g_over_r"] = _ratio(1, 2)
    feats["fwhm_r_over_i"] = _ratio(2, 3)

    av = ~jnp.isnan(asym)
    na = jnp.sum(av)
    feats["fwhm_asymmetry_mean"] = jnp.where(
        na > 0, jnp.sum(jnp.where(av, asym, 0.0)) / jnp.maximum(na, 1),
        jnp.nan)
    return feats


extract = vmap_features(_kernel)
