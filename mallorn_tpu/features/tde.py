"""TDE-specific physics features: color variance/trend, late-time decay,
rise shape, temperature stability, power-law decay indices.

Masked-kernel re-design of reference src/features/tde_physics.py:

- color variance/range/trend on <= 5 d matched (g,r)/(r,i) pairs with
  positive fluxes, >= 3 pairs (:25-90); trend is the per-day slope x100;
- late-time (> peak+50 d) log-log slope, late/peak flux ratio,
  rebrightening = late_max/late_mean (1.0 when late_mean <= 0), bands
  g/r/i with >= 5 points and >= 3 late points (:93-155);
- rise shape = mean(normalized flux)/mean(normalized time) on the rise
  segment (>= 3 points), rise rate = peak/(rise span), bands g/r (:158-206);
- temperature stability from <= 3 d matched g-r pairs with the
  T = 7000/(g-r+0.5) calibration (40000/5000 clamps), stability = cv,
  trend x100/day, late(last 3)/peak(first max(2, n//4)) ratio (:209-284);
- r-band decay: log-log alpha over post-peak (>= 4 post, >= 3 positive),
  residual std, late-only (> 50 d) alpha (:287-352).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M

_BIG = 1.0e30


def _nearest(t1, t2, m2):
    d = jnp.abs(t2[None, :] - t1[:, None])
    d = jnp.where(m2[None, :], d, _BIG)
    j = jnp.argmin(d, axis=1)
    return j, jnp.take_along_axis(d, j[:, None], 1)[:, 0]


def _matched_colors(t1, f1, m1, t2, f2, m2, max_dt):
    j, dmin = _nearest(t1, t2, m2)
    f2n = f2[j]
    pair = m1 & (dmin < max_dt) & (f1 > 0) & (f2n > 0)
    c = -2.5 * jnp.log10(jnp.where(pair, f1, 1.0) / jnp.where(pair, f2n, 1.0))
    return jnp.where(pair, c, jnp.nan), pair


def _kernel(v: ObjectView) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, e, mask = v.band_time, v.band_flux, v.band_err, v.band_mask
    nb = M.count(mask)

    # --- color variance / range / trend ---------------------------------
    for b1, b2, pname in ((1, 2, "g_r"), (2, 3, "r_i")):
        ok_bands = (nb[b1] >= 3) & (nb[b2] >= 3)
        c, pair = _matched_colors(t[b1], f[b1], mask[b1], t[b2], f[b2],
                                  mask[b2], 5.0)
        nc = jnp.sum(pair)
        ok = ok_bands & (nc >= 3)
        feats[f"{pname}_color_var"] = jnp.where(ok, M.var(c, pair, 0), jnp.nan)
        feats[f"{pname}_color_range"] = jnp.where(
            ok, M.mmax(c, pair) - M.mmin(c, pair), jnp.nan)
        slope, _ = M.linfit(t[b1], c, pair)
        feats[f"{pname}_color_trend"] = jnp.where(ok, slope * 100.0, jnp.nan)

    # --- late-time behavior ---------------------------------------------
    for bi, band in ((1, "g"), (2, "r"), (3, "i")):
        tb, fb, mb = t[bi], f[bi], mask[bi]
        ok5 = nb[bi] >= 5
        peak_idx = M.argmax(fb, mb)
        pt = tb[peak_idx]
        pf = fb[peak_idx]
        late = mb & (tb > pt + 50.0)
        nl = jnp.sum(late)
        ok = ok5 & (nl >= 3) & (pf > 0)

        log_t = jnp.log10(jnp.where(late, tb - pt + 1.0, 1.0))
        log_f = jnp.log10(jnp.maximum(jnp.where(late, fb, 1.0), 1e-10))
        t_std = M.std(log_t, late, 0)
        slope, _ = M.linfit(log_t, log_f, late)
        feats[f"{band}_late_slope"] = jnp.where(ok & (t_std > 0), slope, jnp.nan)
        feats[f"{band}_late_flux_ratio"] = jnp.where(
            ok, M.mean(fb, late) / jnp.where(pf > 0, pf, 1.0), jnp.nan)
        lmean = M.mean(fb, late)
        lmax = M.mmax(fb, late)
        reb = jnp.where(lmean > 0, lmax / jnp.where(lmean > 0, lmean, 1.0), 1.0)
        feats[f"{band}_rebrightening"] = jnp.where(ok, reb, jnp.nan)

    # --- rise characteristics -------------------------------------------
    for bi, band in ((1, "g"), (2, "r")):
        tb, fb, mb = t[bi], f[bi], mask[bi]
        ok5 = nb[bi] >= 5
        peak_idx = M.argmax(fb, mb)
        pf = fb[peak_idx]
        idx = jnp.arange(fb.shape[0])
        rise_m = mb & (idx <= peak_idx)
        nr = jnp.sum(rise_m)
        t_first = M.mmin(tb, rise_m)
        t_last = M.mmax(tb, rise_m)
        ok = ok5 & (nr >= 3) & (pf > 0)

        norm_f = jnp.where(rise_m, fb / jnp.where(pf > 0, pf, 1.0), 0.0)
        norm_t = jnp.where(rise_m, (tb - t_first) / (t_last - t_first + 1e-6), 0.0)
        mean_nf = jnp.sum(norm_f) / jnp.maximum(nr, 1)
        mean_nt = jnp.sum(norm_t) / jnp.maximum(nr, 1)
        shape = jnp.where(mean_nt > 0, mean_nf / jnp.where(mean_nt > 0, mean_nt, 1.0), 1.0)
        feats[f"{band}_rise_shape"] = jnp.where(ok, shape, jnp.nan)
        rate = jnp.where(t_last > t_first, pf / (t_last - t_first), jnp.nan)
        feats[f"{band}_rise_rate"] = jnp.where(ok, rate, jnp.nan)

    # --- temperature stability ------------------------------------------
    g_ok = (nb[1] >= 3) & (nb[2] >= 3)
    j, dmin = _nearest(t[1], t[2], mask[2])
    r_f = f[2][j]
    pair = mask[1] & (dmin < 3.0) & (f[1] > 0) & (r_f > 0)
    g_r = -2.5 * jnp.log10(jnp.where(pair, f[1], 1.0) / jnp.where(pair, r_f, 1.0))
    temp = 7000.0 / (g_r + 0.5)
    temp = jnp.where(g_r < -0.5, 40000.0, temp)
    temp = jnp.where(g_r > 1.5, 5000.0, temp)
    nt = jnp.sum(pair)
    ok3 = g_ok & (nt >= 3)

    t_mu = M.mean(temp, pair)
    t_sd = M.std(temp, pair, 0)
    feats["temp_stability"] = jnp.where(ok3, t_sd / t_mu, jnp.nan)
    slope, _ = M.linfit(t[1], jnp.where(pair, temp, 0.0), pair)
    feats["temp_trend"] = jnp.where(ok3, slope * 100.0, jnp.nan)

    pos = jnp.cumsum(pair) - 1
    peak_n = jnp.maximum(2, nt // 4)
    early_m = pair & (pos < peak_n)
    late_m = pair & (pos >= nt - 3)
    ratio = M.mean(temp, late_m) / M.mean(temp, early_m)
    feats["temp_late_vs_peak"] = jnp.where(ok3 & (nt > 4), ratio, jnp.nan)

    # --- power-law decay (r band) ---------------------------------------
    tb, fb, mb = t[2], f[2], mask[2]
    ok5 = nb[2] >= 5
    peak_idx = M.argmax(fb, mb)
    pt = tb[peak_idx]
    pf = fb[peak_idx]
    post = mb & (tb > pt)
    npost = jnp.sum(post)
    dt = jnp.maximum(jnp.where(post, tb - pt, 1.0), 1.0)
    valid = post & (fb > 0)
    nvalid = jnp.sum(valid)
    ok = ok5 & (npost >= 4) & (pf > 0) & (nvalid >= 3)

    log_t = jnp.log10(dt)
    log_f = jnp.log10(jnp.where(valid, fb, 1.0))
    slope, intercept = M.linfit(log_t, log_f, valid)
    pred = slope * log_t + intercept
    resid_sd = M.std(log_f - pred, valid, 0)
    feats["r_decay_alpha"] = jnp.where(ok, slope, jnp.nan)
    feats["r_decay_residual"] = jnp.where(ok, resid_sd, jnp.nan)

    late_valid = valid & (dt > 50.0)
    nlv = jnp.sum(late_valid)
    slope_l, _ = M.linfit(log_t, log_f, late_valid)
    feats["r_decay_alpha_late"] = jnp.where(ok & (nlv >= 3), slope_l, jnp.nan)

    return feats


extract = vmap_features(_kernel)
