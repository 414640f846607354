"""Physics-based features: Stetson variability indices, structure function,
rest-frame timescales, blackbody temperature proxies, Bazin-approximation
parameters, SNR statistics.

Masked-kernel re-design of reference src/features/physics_based.py.
Bands participate with >= 3 observations (:306-314). Semantics:

- Stetson J between band pairs: nearest-neighbor matching within 0.5 d,
  band means/stds over ALL points, mean of sign(d1 d2) sqrt|d1 d2|
  (:31-82); 0.0 when either band std is 0, NaN when no pairs;
- Stetson K per band: |f - mean|/err over err>0 points (>= 4),
  sum(d)/sqrt(sum d^2)/sqrt(n_all) (:85-107);
- structure function on r band: sqrt(mean df^2) over pairs with
  |dt| in [0.5 tau, 1.5 tau], >= 3 pairs; log-log slope over >= 3 valid
  taus (:110-168);
- rest-frame durations/rise/fade divided by (1+z) (:347-379);
- temperature from peak g/r/i fluxes and at +50 d (nearest obs within
  20 d), empirical T = 7000/(g-r+0.6) clipped (:171-199, 381-423);
- Bazin-like approximations on the r band without fitting (:202-289);
- SNR stats + excess variance over err>0 & flux>0 points (:435-456).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M

_BIG = 1.0e30
SF_TAUS = (1.0, 5.0, 10.0, 30.0, 100.0)


def _stetson_j(t1, f1, e1, m1, t2, f2, e2, m2, max_dt=0.5):
    mean1 = M.mean(f1, m1)
    mean2 = M.mean(f2, m2)
    std1 = M.std(f1, m1, 0)
    std2 = M.std(f2, m2, 0)

    # nearest band-2 observation for each band-1 observation
    d = jnp.abs(t2[None, :] - t1[:, None])
    d = jnp.where(m2[None, :], d, _BIG)
    j2 = jnp.argmin(d, axis=1)
    dmin = jnp.take_along_axis(d, j2[:, None], 1)[:, 0]
    f2n = f2[j2]
    e2n = e2[j2]

    pair = m1 & (dmin <= max_dt) & (e1 > 0) & (e2n > 0)
    d1 = (f1 - mean1) / jnp.where(e1 > 0, e1, 1.0)
    d2 = (f2n - mean2) / jnp.where(e2n > 0, e2n, 1.0)
    prod = d1 * d2
    contrib = jnp.sign(prod) * jnp.sqrt(jnp.abs(prod))
    n_pairs = jnp.sum(pair)
    j = jnp.sum(jnp.where(pair, contrib, 0.0)) / jnp.maximum(n_pairs, 1)
    j = jnp.where(n_pairs > 0, j, jnp.nan)
    j = jnp.where((std1 == 0) | (std2 == 0), 0.0, j)
    ok = (M.count(m1) >= 3) & (M.count(m2) >= 3)
    return jnp.where(ok, j, jnp.nan)


def _stetson_k(f, e, m):
    n = M.count(m)
    mean_f = M.mean(f, m)
    valid = m & (e > 0)
    nv = jnp.sum(valid)
    delta = jnp.abs(f - mean_f) / jnp.where(e > 0, e, 1.0)
    s1 = jnp.sum(jnp.where(valid, delta, 0.0))
    s2 = jnp.sum(jnp.where(valid, delta * delta, 0.0))
    k = s1 / jnp.sqrt(s2) / jnp.sqrt(n.astype(f.dtype))
    return jnp.where((n >= 4) & (nv >= 4), k, jnp.nan)


def _structure_function(t, f, m):
    out = {}
    n = M.count(m)
    pair = m[:, None] & m[None, :]
    iu = jnp.triu(jnp.ones_like(pair), k=1).astype(bool)
    pair = pair & iu
    dt = jnp.abs(t[None, :] - t[:, None])
    df2 = (f[None, :] - f[:, None]) ** 2

    sf_vals = []
    for tau in SF_TAUS:
        sel = pair & (dt >= 0.5 * tau) & (dt <= 1.5 * tau)
        ns = jnp.sum(sel)
        sf = jnp.sqrt(jnp.sum(jnp.where(sel, df2, 0.0)) / jnp.maximum(ns, 1))
        sf = jnp.where((ns >= 3) & (n >= 5), sf, jnp.nan)
        out[f"sf_tau_{int(tau)}"] = sf
        sf_vals.append(sf)

    sfv = jnp.stack(sf_vals)
    taus = jnp.log10(jnp.asarray(SF_TAUS))
    valid = ~jnp.isnan(sfv) & (sfv > 0)
    logsf = jnp.log10(jnp.where(valid, sfv, 1.0))
    slope, _ = M.linfit(taus, logsf, valid)
    out["sf_slope"] = jnp.where(jnp.sum(valid) >= 3, slope, jnp.nan)
    return out


def _estimate_temperature(g, r, i):
    ok = (g > 0) & (r > 0) & (i > 0) & ~(jnp.isnan(g) | jnp.isnan(r) | jnp.isnan(i))
    c = -2.5 * jnp.log10(jnp.where(ok, g, 1.0) / jnp.where(ok, r, 1.0))
    temp = 7000.0 / (c + 0.6)
    temp = jnp.where(c < -0.5, 50000.0, temp)
    temp = jnp.where(c > 2.0, 3000.0, temp)
    return jnp.where(ok, jnp.clip(temp, 3000.0, 100000.0), jnp.nan)


def _bazin_simple(t, f, m):
    """fit_bazin_simple on the (time-sorted) r band (:202-289)."""
    out = {}
    n = M.count(m)
    ok5 = n >= 5
    peak_idx = M.argmax(f, m)
    pf = f[peak_idx]
    ptime = t[peak_idx]
    out["bazin_amplitude"] = jnp.where(ok5, pf, jnp.nan)
    out["bazin_t0"] = jnp.where(ok5, ptime, jnp.nan)

    idx = jnp.arange(f.shape[0])
    pre = m & (idx <= peak_idx)
    n_pre = jnp.sum(pre)

    # Reference loop quirk (:243-248): ``t_10`` only updates while it still
    # equals times[0], so when the first point is itself above threshold the
    # scan advances to the NEXT qualifying point. Net effect: t_10 = first
    # above-10% point with index >= 1, scanned only up to the break index
    # (first above-90% point); fallback times[0].
    above90 = pre & (f >= 0.9 * pf)
    has90 = jnp.any(above90)
    b90 = jnp.where(has90, jnp.argmax(above90), peak_idx)
    t90 = jnp.where(has90, t[b90], ptime)
    above10 = pre & (f >= 0.1 * pf) & (idx >= 1) & (idx <= b90)
    has10 = jnp.any(above10)
    t10 = jnp.where(has10, t[jnp.argmax(above10)], t[0])
    rise = t90 - t10
    out["bazin_rise_approx"] = jnp.where(ok5 & (n_pre >= 2), rise, jnp.nan)

    post = m & (idx >= peak_idx)
    n_post = jnp.sum(post)
    target = pf / jnp.e
    below = post & (f <= target)
    has_below = jnp.any(below)
    t_below = t[jnp.argmax(below)]
    last_i = jnp.maximum(n - 1, 0)
    t_last = t[last_i]
    f_last = f[last_i]
    fall_extrap = (t_last - ptime) * pf / (pf - f_last + 1e-6)
    fall = jnp.where(has_below, t_below - ptime,
                     jnp.where(n_post > 1, fall_extrap, jnp.nan))
    out["bazin_fall_approx"] = jnp.where(ok5 & (n_post >= 3), fall, jnp.nan)

    # plateau: post-peak fluxes split at the midpoint
    post_pos = jnp.cumsum(post) - 1  # position within post sequence
    mid = n_post // 2
    early_m = post & (post_pos < mid)
    late_m = post & (post_pos >= mid)
    early = M.mean(f, early_m)
    late = M.mean(f, late_m)
    plat = jnp.where(early > 0, late / early, jnp.nan)
    out["bazin_plateau"] = jnp.where(ok5 & (n_post >= 5), plat, jnp.nan)
    return out


def _kernel(v: ObjectView, z: jnp.ndarray) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, e, mask = v.band_time, v.band_flux, v.band_err, v.band_mask
    nb = M.count(mask)
    bok = nb >= 3
    bm = mask & bok[:, None]

    # Stetson J for (g,r), (r,i), (g,i) -> indices (1,2), (2,3), (1,3)
    for b1, b2, name in ((1, 2, "gr"), (2, 3, "ri"), (1, 3, "gi")):
        feats[f"stetson_j_{name}"] = _stetson_j(
            t[b1], f[b1], e[b1], bm[b1], t[b2], f[b2], e[b2], bm[b2])

    for bi, band in ((1, "g"), (2, "r"), (3, "i")):
        k = _stetson_k(f[bi], e[bi], bm[bi])
        feats[f"stetson_k_{band}"] = jnp.where(bok[bi], k, jnp.nan)

    sf = _structure_function(t[2], f[2], bm[2])
    for kname, val in sf.items():
        feats[f"r_{kname}"] = jnp.where(bok[2], val, jnp.nan)

    zz = jnp.where(jnp.isnan(z), 0.0, z)
    for bi, band in ((1, "g"), (2, "r"), (3, "i")):
        tb, fb, mb = t[bi], f[bi], bm[bi]
        t0 = M.mmin(tb, mb)
        t1 = M.mmax(tb, mb)
        peak_idx = M.argmax(fb, mb)
        t_peak = tb[peak_idx]
        n = M.count(mb)
        dur = (t1 - t0) / (1.0 + zz)
        feats[f"{band}_rest_duration"] = jnp.where(bok[bi], dur, jnp.nan)
        feats[f"{band}_rest_rise"] = jnp.where(
            bok[bi] & (peak_idx > 0), (t_peak - t0) / (1.0 + zz), jnp.nan)
        feats[f"{band}_rest_fade"] = jnp.where(
            bok[bi] & (peak_idx < n - 1), (t1 - t_peak) / (1.0 + zz), jnp.nan)

    # temperature (needs g, r, i all with >= 3 points)
    has_gri = bok[1] & bok[2] & bok[3]
    gp = M.mmax(f[1], bm[1])
    rp = M.mmax(f[2], bm[2])
    ip = M.mmax(f[3], bm[3])
    t_at_peak = _estimate_temperature(gp, rp, ip)
    feats["temp_at_peak"] = jnp.where(has_gri, t_at_peak, jnp.nan)

    r_peak_t = t[2][M.argmax(f[2], bm[2])]
    target = r_peak_t + 50.0
    g_late = M.value_at_nearest(t[1], f[1], bm[1], target, 20.0)
    r_late = M.value_at_nearest(t[2], f[2], bm[2], target, 20.0)
    i_late = M.value_at_nearest(t[3], f[3], bm[3], target, 20.0)
    t50 = _estimate_temperature(
        jnp.where(jnp.isnan(g_late), jnp.nan, g_late),
        jnp.where(jnp.isnan(r_late), jnp.nan, r_late),
        jnp.where(jnp.isnan(i_late), jnp.nan, i_late))
    feats["temp_post_50d"] = jnp.where(has_gri, t50, jnp.nan)
    both = ~jnp.isnan(feats["temp_at_peak"]) & ~jnp.isnan(feats["temp_post_50d"])
    feats["temp_evolution"] = jnp.where(
        both, (feats["temp_post_50d"] - feats["temp_at_peak"]) / 50.0, jnp.nan)

    bz = _bazin_simple(t[2], f[2], bm[2])
    for kname, val in bz.items():
        feats[f"r_{kname}"] = jnp.where(bok[2], val, jnp.nan)

    # SNR + excess variance over the all-band view
    af, ae, am = v.all_flux, v.all_err, v.all_mask
    valid = am & (ae > 0) & (af > 0)
    nv = jnp.sum(valid)
    snr = af / jnp.where(ae > 0, ae, 1.0)
    feats["mean_snr"] = M.mean(snr, valid)
    feats["median_snr"] = M.median(snr, valid)
    mean_flux = M.mean(af, valid)
    var_flux = M.var(af, valid, 0)
    mean_var_noise = M.mean(ae * ae, valid)
    excess = (var_flux - mean_var_noise) / (mean_flux * mean_flux)
    feats["excess_variance"] = jnp.where(nv > 0, jnp.maximum(0.0, excess), jnp.nan)

    return feats


_extract = vmap_features(_kernel)


def extract(packed, meta) -> FeatureSet:
    """Physics features; r_bazin_t0 is an absolute epoch -> add offset."""
    z = jnp.asarray(meta.z) if meta is not None else jnp.zeros(packed.n_objects)
    feats = _extract(packed, z)
    feats["r_bazin_t0"] = feats["r_bazin_t0"] + packed.time_offset
    return feats
