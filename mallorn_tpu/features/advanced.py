"""v20/v30-era advanced features: absolute magnitudes, pairwise-MHPS,
FLEET widths, pre-peak colors, autocorrelation, early/late ratios,
higher-order statistics.

Masked-kernel re-design of reference src/features/advanced_features.py.
Bands participate with >= 3 points (:489-498). Semantics:

- absolute magnitude (:36-89): m_AB from microJy, flat-LCDM D_L (exact
  quad integral replaced by fixed-grid Simpson for z >= 0.1), distance
  modulus, flat-spectrum K-correction;
- pairwise MHPS (:92-192): sqrt(mean over pairs with dt/scale < 5 of
  (f2-f1)^2 |ricker(dt/scale)|) on mean-normalized flux, scales
  10/30/100/365 for r and g + ratios;
- FLEET (:195-277): exponential rise/fall timescales from log-flux
  regressions (slope < 0 -> tau = -1/slope); fleet_chi2 is always NaN in
  the reference (initialized, never assigned) — replicated;
- pre-peak colors (:280-329): <= 5 d matched pairs before the r-band peak;
- autocorrelation (:332-381): 1-day-grid ACF at lags 10/30 + ratio;
- early/late thirds flux/variance ratios (:384-437);
- higher-order stats incl. biweight midvariance (:440-473);
- g-r peak lag (:586-592).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.features.research import _np_interp
from mallorn_tpu.ops import masked as M

_BIG = 1.0e30
H0, C_KM = 70.0, 299792.458
MHPS_SCALES = (10.0, 30.0, 100.0, 365.0)
GRID_LEN = 1024


def _lum_dist(z):
    """Flat-LCDM D_L: cz/H0 below 0.1, Simpson-integrated above (:58-74)."""
    n_grid = 64
    frac = jnp.linspace(0.0, 1.0, n_grid + 1)
    zz = z * frac
    integrand = 1.0 / jnp.sqrt(0.3 * (1.0 + zz) ** 3 + 0.7)
    h = z / n_grid
    w = jnp.ones(n_grid + 1).at[1:-1:2].set(4.0).at[2:-1:2].set(2.0)
    integral = h / 3.0 * jnp.sum(w * integrand)
    d_hi = (C_KM / H0) * (1.0 + z) * integral
    d_lo = C_KM * z / H0
    return jnp.where(z < 0.1, d_lo, d_hi)


def _abs_mag(flux, z):
    ok = (flux > 0) & ~jnp.isnan(flux) & ~jnp.isnan(z) & (z > 0)
    m_ab = -2.5 * jnp.log10(jnp.where(ok, flux, 1.0) * 1e-6) + 8.90
    d_l = _lum_dist(jnp.maximum(z, 1e-6))
    mu = 5.0 * jnp.log10(jnp.maximum(d_l, 1e-10)) + 25.0
    k = -2.5 * jnp.log10(1.0 + z)
    return jnp.where(ok & (d_l > 0), m_ab - mu - k, jnp.nan)


def _mhps_pairwise(t, f, mask, scale):
    n = M.count(mask)
    mu = M.mean(f, mask)
    ok = (n >= 5) & (mu != 0)
    nf = (f - mu) / jnp.where(mu != 0, mu, 1.0)
    pair = mask[:, None] & mask[None, :]
    pair = pair & jnp.triu(jnp.ones_like(pair), k=1).astype(bool)
    tn = jnp.abs(t[None, :] - t[:, None]) / scale
    sel = pair & (tn < 5.0)
    kern = jnp.abs((1.0 - tn * tn) * jnp.exp(-tn * tn / 2.0))
    df2 = (nf[None, :] - nf[:, None]) ** 2
    npair = jnp.sum(sel)
    val = jnp.sqrt(jnp.sum(jnp.where(sel, df2 * kern, 0.0)) / jnp.maximum(npair, 1))
    return jnp.where(ok & (npair > 0), val, jnp.nan)


def _fleet(t, f, mask):
    n = M.count(mask)
    pk = M.argmax(f, mask)
    pt, pf = t[pk], f[pk]
    ok = (n >= 5) & (pf > 0)

    def tau_of(seg_mask, dt):
        valid = seg_mask & (f > 0)
        nv = jnp.sum(valid)
        log_ratio = jnp.log(jnp.maximum(jnp.where(valid, f, 1.0) / jnp.where(pf > 0, pf, 1.0), 1e-30))
        d_std = M.std(jnp.where(valid, dt, 0.0), valid, 0)
        slope, _ = M.linfit(dt, log_ratio, valid)
        good = (jnp.sum(seg_mask) >= 3) & (nv >= 3) & (d_std > 0) & (slope < 0)
        return jnp.where(good, -1.0 / jnp.where(slope < 0, slope, -1.0), jnp.nan)

    rise_tau = tau_of(mask & (t < pt), pt - t)
    fall_tau = tau_of(mask & (t > pt), t - pt)

    both = ~jnp.isnan(rise_tau) & ~jnp.isnan(fall_tau)
    width = jnp.where(both, (rise_tau + fall_tau) / 2.0,
                      jnp.where(~jnp.isnan(fall_tau), fall_tau, rise_tau))
    asym = jnp.where(both & (rise_tau > 0), fall_tau / jnp.where(rise_tau > 0, rise_tau, 1.0),
                     jnp.nan)
    return (jnp.where(ok, width, jnp.nan), jnp.where(ok, asym, jnp.nan))


def _acf(t, f, mask):
    n = M.count(mask)
    t0 = M.mmin(t, mask)
    t1 = M.mmax(t, mask)
    span = t1 - t0
    g_len = jnp.clip(jnp.ceil(span).astype(jnp.int32), 1, GRID_LEN)
    ok = (n >= 10) & (span >= 30.0) & (g_len >= 20)

    grid = t0 + jnp.arange(GRID_LEN, dtype=jnp.float32)
    x = _np_interp(grid, t, f, mask)
    gm = jnp.arange(GRID_LEN) < g_len
    mu = jnp.sum(jnp.where(gm, x, 0.0)) / jnp.maximum(g_len, 1)
    sd = jnp.sqrt(jnp.sum(jnp.where(gm, (x - mu) ** 2, 0.0)) / jnp.maximum(g_len, 1))
    x = jnp.where(gm, (x - mu) / (sd + 1e-10), 0.0)

    def lag(k):
        prod = x * jnp.roll(x, -k)
        valid = gm & (jnp.arange(GRID_LEN) + k < g_len)
        return jnp.sum(jnp.where(valid, prod, 0.0)) / jnp.maximum(g_len, 1)

    a10 = jnp.where(ok & (g_len > 11), lag(10), jnp.nan)
    a30 = jnp.where(ok & (g_len > 31), lag(30), jnp.nan)
    ratio = jnp.where(~jnp.isnan(a10) & ~jnp.isnan(a30) & (jnp.abs(a30) > 0.01),
                      a10 / jnp.where(jnp.abs(a30) > 0.01, a30, 1.0), jnp.nan)
    return a10, a30, ratio


def _hos(f, mask):
    n = M.count(mask)
    ok = n >= 5
    mu = M.mean(f, mask)
    m2 = M.var(f, mask, 0)
    d = jnp.where(mask, f - mu, 0.0)
    m3 = jnp.sum(d ** 3, -1) / jnp.maximum(n, 1)
    m4 = jnp.sum(d ** 4, -1) / jnp.maximum(n, 1)
    skew = jnp.where(m2 > 0, m3 / jnp.where(m2 > 0, m2, 1.0) ** 1.5, jnp.nan)
    kurt = jnp.where(m2 > 0, m4 / jnp.where(m2 > 0, m2, 1.0) ** 2 - 3.0, jnp.nan)

    med = M.median(f, mask)
    mad = M.median(jnp.abs(f - med), mask)
    u = (f - med) / jnp.where(mad > 0, 9.0 * mad, 1.0)
    valid = mask & (jnp.abs(u) < 1.0)
    nv = jnp.sum(valid)
    num = jnp.sum(jnp.where(valid, (f - med) ** 2 * (1.0 - u * u) ** 4, 0.0), -1)
    den = jnp.sum(jnp.where(valid, (1.0 - u * u) * (1.0 - 5.0 * u * u), 0.0), -1) ** 2
    biw = jnp.where((mad > 0) & (nv >= 3) & (den > 0),
                    n * num / jnp.where(den > 0, den, 1.0), jnp.nan)
    return (jnp.where(ok, skew, jnp.nan), jnp.where(ok, kurt, jnp.nan),
            jnp.where(ok, biw, jnp.nan))


def _kernel(v: ObjectView, z: jnp.ndarray) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, mask = v.band_time, v.band_flux, v.band_mask
    nb = M.count(mask)
    bok = nb >= 3
    bm = mask & bok[:, None]

    # absolute magnitudes
    for bi, band in ((1, "g"), (2, "r"), (3, "i")):
        pkf = M.mmax(f[bi], bm[bi])
        muf = M.mean(f[bi], bm[bi])
        feats[f"{band}_abs_mag_peak"] = jnp.where(bok[bi], _abs_mag(pkf, z), jnp.nan)
        feats[f"{band}_abs_mag_mean"] = jnp.where(bok[bi], _abs_mag(muf, z), jnp.nan)

    # MHPS (pairwise variant) for r and g
    for bi, band in ((2, "r"), (1, "g")):
        vals = {}
        for s in MHPS_SCALES:
            vals[s] = jnp.where(bok[bi], _mhps_pairwise(t[bi], f[bi], bm[bi], s), jnp.nan)
            feats[f"{band}_mhps_{int(s)}"] = vals[s]
        r1 = jnp.where(~jnp.isnan(vals[10.0]) & ~jnp.isnan(vals[100.0]) & (vals[100.0] > 0),
                       vals[10.0] / jnp.where(vals[100.0] > 0, vals[100.0], 1.0), jnp.nan)
        r2 = jnp.where(~jnp.isnan(vals[30.0]) & ~jnp.isnan(vals[365.0]) & (vals[365.0] > 0),
                       vals[30.0] / jnp.where(vals[365.0] > 0, vals[365.0], 1.0), jnp.nan)
        feats[f"{band}_mhps_ratio_10_100"] = r1
        feats[f"{band}_mhps_ratio_30_365"] = r2

    # FLEET for r, g (fleet_chi2 always NaN, reference :207-211)
    for bi, band in ((2, "r"), (1, "g")):
        w, a = _fleet(t[bi], f[bi], bm[bi])
        feats[f"{band}_fleet_width"] = jnp.where(bok[bi], w, jnp.nan)
        feats[f"{band}_fleet_asymmetry"] = jnp.where(bok[bi], a, jnp.nan)
        feats[f"{band}_fleet_chi2"] = jnp.full_like(w, jnp.nan)

    # pre-peak colors (peak = r-band argmax over the >= 3 gated band)
    r_peak = jnp.where(bok[2], t[2][M.argmax(f[2], bm[2])], jnp.nan)
    for b1, b2, pname in ((1, 2, "g_r"), (2, 3, "r_i")):
        pre1 = mask[b1] & (t[b1] < r_peak)
        pre2 = mask[b2] & (t[b2] < r_peak)
        enough = (jnp.sum(pre1) >= 2) & (jnp.sum(pre2) >= 2) & ~jnp.isnan(r_peak)
        d = jnp.abs(t[b2][None, :] - t[b1][:, None])
        d = jnp.where(pre2[None, :], d, _BIG)
        j = jnp.argmin(d, axis=1)
        dmin = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
        f2 = f[b2][j]
        pairm = pre1 & (dmin < 5.0) & (f[b1] > 0) & (f2 > 0)
        c = -2.5 * jnp.log10(jnp.where(pairm, f[b1], 1.0) / jnp.where(pairm, f2, 1.0))
        nc = jnp.sum(pairm)
        mu_c = jnp.sum(jnp.where(pairm, c, 0.0)) / jnp.maximum(nc, 1)
        feats[f"pre_peak_{pname}_mean"] = jnp.where(enough & (nc >= 2), mu_c, jnp.nan)
        slope, _ = M.linfit(t[b1], c, pairm)
        feats[f"pre_peak_{pname}_slope"] = jnp.where(enough & (nc >= 3), slope * 10.0, jnp.nan)

    # autocorrelation (r band)
    a10, a30, ar = _acf(t[2], f[2], bm[2])
    feats["r_acf_10d"] = jnp.where(bok[2], a10, jnp.nan)
    feats["r_acf_30d"] = jnp.where(bok[2], a30, jnp.nan)
    feats["r_acf_ratio"] = jnp.where(bok[2], ar, jnp.nan)

    # early/late thirds (all-band time span; raw band counts >= 5)
    n_all = M.count(v.all_mask)
    t_min = M.mmin(v.all_time, v.all_mask)
    t_max = M.mmax(v.all_time, v.all_mask)
    third = (t_max - t_min) / 3.0
    ok_all = n_all >= 10
    for bi, band in ((1, "g"), (2, "r"), (3, "i")):
        okb = ok_all & (nb[bi] >= 5)
        early = mask[bi] & (t[bi] < t_min + third)
        late = mask[bi] & (t[bi] > t_max - third)
        ne, nl = jnp.sum(early), jnp.sum(late)
        okb = okb & (ne >= 2) & (nl >= 2)
        e_mu = M.mean(f[bi], early)
        l_mu = M.mean(f[bi], late)
        feats[f"{band}_early_late_flux_ratio"] = jnp.where(
            okb & (e_mu > 0), l_mu / jnp.where(e_mu > 0, e_mu, 1.0), jnp.nan)
        e_v = M.var(f[bi], early, 0)
        l_v = M.var(f[bi], late, 0)
        feats[f"{band}_early_late_var_ratio"] = jnp.where(
            okb & (e_v > 0), l_v / jnp.where(e_v > 0, e_v, 1.0), jnp.nan)

    # higher-order stats: all fluxes + per g/r band
    sk, ku, bw = _hos(v.all_flux, v.all_mask)
    feats["flux_skewness"] = sk
    feats["flux_kurtosis"] = ku
    feats["flux_biweight"] = bw
    for bi, band in ((1, "g"), (2, "r")):
        sk, ku, bw = _hos(f[bi], bm[bi])
        feats[f"{band}_flux_skewness"] = jnp.where(bok[bi], sk, jnp.nan)
        feats[f"{band}_flux_kurtosis"] = jnp.where(bok[bi], ku, jnp.nan)
        feats[f"{band}_flux_biweight"] = jnp.where(bok[bi], bw, jnp.nan)

    # peak lags + peak flux ratios (:586-619)
    g_pt = t[1][M.argmax(f[1], bm[1])]
    r_pt = t[2][M.argmax(f[2], bm[2])]
    i_pt = t[3][M.argmax(f[3], bm[3])]
    feats["peak_lag_g_r"] = jnp.where(bok[1] & bok[2], g_pt - r_pt, jnp.nan)
    feats["peak_lag_r_i"] = jnp.where(bok[2] & bok[3], r_pt - i_pt, jnp.nan)

    g_pk = M.mmax(f[1], bm[1])
    r_pk = M.mmax(f[2], bm[2])
    i_pk = M.mmax(f[3], bm[3])
    feats["peak_flux_ratio_g_r"] = jnp.where(
        bok[1] & bok[2] & (r_pk > 0), g_pk / jnp.where(r_pk > 0, r_pk, 1.0), jnp.nan)
    feats["peak_flux_ratio_r_i"] = jnp.where(
        bok[2] & bok[3] & (i_pk > 0), r_pk / jnp.where(i_pk > 0, i_pk, 1.0), jnp.nan)
    return feats


_extract = vmap_features(_kernel)


def extract(packed, meta) -> FeatureSet:
    z = jnp.asarray(meta.z) if meta is not None else jnp.full(packed.n_objects, jnp.nan)
    return _extract(packed, z)
