"""v59/66 high-SNR physics features: magnitude structure functions, the
bluer-when-brighter relation, cross-band decline consistency, explicit
TDE power-law deviation tests, flux-stability metrics.

Masked-kernel re-design of reference src/features/high_snr_physics.py:

- SF on magnitudes (-2.5 log10 max(f, 1e-10)) for r/g bands (>= 10 pts),
  taus (1,5,10,20,50,100) with the STRICT window 0.5t < dt < 1.5t
  (:34-127); slope+amplitude from a log-log fit over >= 3 valid taus;
  DRW tau = first valid-tau pair whose SF derivative drops below 0.01
  (>= 4 valid taus);
- color-magnitude relation on <= 3 d matched g/r pairs (>= 5):
  Pearson correlation, slope, BWB strength, scatter (:130-202);
- decline consistency g/r/i: linear post-peak decline rate on
  peak-normalized flux, cross-band CV / smoothness / rate ratios (:203-289);
- TDE power-law deviation (r band, >= 8 pts): best-fit alpha > 10 d
  post-peak, |alpha + 5/3|, |alpha + 5/12|, fit chi2 (:292-364);
- flux stability (r/g, >= 10 pts): point-to-point scatter, monotonicity,
  noise ratio, 3-point-smooth score (:367-432).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M

_BIG = 1.0e30
SF_TAUS = (1.0, 5.0, 10.0, 20.0, 50.0, 100.0)


def _sf_block(t, f, mask, nb, band_name):
    out = {}
    ok = nb >= 10
    mags = -2.5 * jnp.log10(jnp.maximum(f, 1e-10))
    pair = mask[:, None] & mask[None, :]
    pair = pair & jnp.triu(jnp.ones_like(pair), k=1).astype(bool)
    dt = t[None, :] - t[:, None]
    dm2 = (mags[None, :] - mags[:, None]) ** 2

    sfs = []
    for tau in SF_TAUS:
        sel = pair & (dt > 0.5 * tau) & (dt < 1.5 * tau)
        ns = jnp.sum(sel)
        sf = jnp.sqrt(jnp.sum(jnp.where(sel, dm2, 0.0)) / jnp.maximum(ns, 1))
        sf = jnp.where(ok & (ns >= 3), sf, jnp.nan)
        out[f"{band_name}_sf_tau_{int(tau)}"] = sf
        sfs.append(sf)

    sfv = jnp.stack(sfs)
    taus = jnp.asarray(SF_TAUS)
    valid = ~jnp.isnan(sfv)
    nv = jnp.sum(valid)
    slope, intercept = M.linfit(jnp.log10(taus),
                                jnp.log10(jnp.maximum(jnp.where(valid, sfv, 1.0), 1e-10)),
                                valid)
    out[f"{band_name}_sf_slope"] = jnp.where(nv >= 3, slope, jnp.nan)
    out[f"{band_name}_sf_amplitude"] = jnp.where(nv >= 3, 10.0 ** intercept, jnp.nan)

    # DRW tau over the compacted valid taus
    order = jnp.argsort(~valid, stable=True)
    sf_c = sfv[order]
    tau_c = taus[order]
    dsf = (sf_c[1:] - sf_c[:-1]) / jnp.maximum(tau_c[1:] - tau_c[:-1], 1e-10)
    kmask = jnp.arange(len(SF_TAUS) - 1) < nv - 1
    flat = kmask & (dsf < 0.01)
    has_flat = jnp.any(flat)
    drw = tau_c[jnp.argmax(flat)]
    out[f"{band_name}_sf_drw_tau"] = jnp.where((nv >= 4) & has_flat & (nv >= 3),
                                               drw, jnp.nan)
    return out


def _kernel(v: ObjectView) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, e, mask = v.band_time, v.band_flux, v.band_err, v.band_mask
    nb = M.count(mask)

    # --- structure functions for r, g ------------------------------------
    for bi, bname in ((2, "r"), (1, "g")):
        feats.update(_sf_block(t[bi], f[bi], mask[bi], nb[bi], bname))

    # --- color-magnitude (bluer-when-brighter) ---------------------------
    ok_cm = (nb[1] >= 5) & (nb[2] >= 5)
    d = jnp.abs(t[2][None, :] - t[1][:, None])
    d = jnp.where(mask[2][None, :], d, _BIG)
    j = jnp.argmin(d, axis=1)
    dmin = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
    rf = f[2][j]
    pairm = mask[1] & (dmin < 3.0) & (f[1] > 0) & (rf > 0)
    col = -2.5 * jnp.log10(jnp.where(pairm, f[1], 1.0) / jnp.where(pairm, rf, 1.0))
    rmag = -2.5 * jnp.log10(jnp.where(pairm, rf, 1.0))
    npair = jnp.sum(pairm)
    okp = ok_cm & (npair >= 5)

    cmu = M.mean(col, pairm)
    mmu = M.mean(rmag, pairm)
    csd = M.std(col, pairm, 0)
    msd = M.std(rmag, pairm, 0)
    cov = jnp.sum(jnp.where(pairm, (col - cmu) * (rmag - mmu), 0.0)) / jnp.maximum(npair, 1)
    corr = cov / jnp.maximum(csd * msd, 1e-30)
    slope, intercept = M.linfit(rmag, col, pairm)
    resid = jnp.where(pairm, col - (slope * rmag + intercept), 0.0)
    feats["color_mag_correlation"] = jnp.where(okp, corr, jnp.nan)
    feats["color_mag_slope"] = jnp.where(okp, slope, jnp.nan)
    feats["bwb_strength"] = jnp.where(okp, -slope, jnp.nan)
    feats["color_mag_scatter"] = jnp.where(okp, M.std(resid, pairm, 0), jnp.nan)

    # --- decline consistency ---------------------------------------------
    rates, resids = [], []
    idx_t = jnp.arange(t.shape[-1])
    for bi in (1, 2, 3):
        ok5 = nb[bi] >= 5
        pk = M.argmax(f[bi], mask[bi])
        post = mask[bi] & (idx_t >= pk)
        npost = jnp.sum(post)
        pflux = f[bi][pk]
        norm = jnp.where(post, f[bi] / jnp.where(pflux > 0, pflux, 1.0), 0.0)
        relt = jnp.where(post, t[bi] - t[bi][pk], 0.0)
        vmask = post & (norm > 0)
        nvv = jnp.sum(vmask)
        slope_b, ic = M.linfit(relt, norm, vmask)
        pred = slope_b * relt + ic
        res_sd = M.std(jnp.where(vmask, norm - pred, 0.0), vmask, 0)
        good = ok5 & (npost >= 4) & (pflux > 0) & (nvv >= 3)
        rates.append(jnp.where(good, slope_b, jnp.nan))
        resids.append(jnp.where(good, res_sd, jnp.nan))

    rv = jnp.stack(rates)
    dv = jnp.stack(resids)
    rm = ~jnp.isnan(rv)
    nrb = jnp.sum(rm)
    rmu = jnp.sum(jnp.where(rm, rv, 0.0)) / jnp.maximum(nrb, 1)
    rsd = jnp.sqrt(jnp.sum(jnp.where(rm, (rv - rmu) ** 2, 0.0)) / jnp.maximum(nrb, 1))
    cv = jnp.where(rmu != 0, rsd / jnp.abs(rmu), jnp.nan)
    feats["decline_rate_cv"] = jnp.where(nrb >= 2, cv, jnp.nan)
    dm = ~jnp.isnan(dv)
    ndb = jnp.sum(dm)
    feats["decline_smoothness_avg"] = jnp.where(
        (nrb >= 2) & (ndb >= 2),
        jnp.sum(jnp.where(dm, dv, 0.0)) / jnp.maximum(ndb, 1), jnp.nan)
    g_r = jnp.where(rv[1] != 0, rv[0] / jnp.where(rv[1] != 0, rv[1], 1.0), jnp.nan)
    feats["decline_ratio_g_r"] = jnp.where((nrb >= 2) & rm[0] & rm[1], g_r, jnp.nan)
    r_i = jnp.where(rv[2] != 0, rv[1] / jnp.where(rv[2] != 0, rv[2], 1.0), jnp.nan)
    feats["decline_ratio_r_i"] = jnp.where((nrb >= 2) & rm[1] & rm[2], r_i, jnp.nan)

    # --- TDE power-law deviation (r) -------------------------------------
    ok8 = nb[2] >= 8
    pk = M.argmax(f[2], mask[2])
    pt = t[2][pk]
    pf = f[2][pk]
    post = mask[2] & (t[2] > pt + 10.0)
    npost = jnp.sum(post)
    valid = post & (f[2] > 0)
    nvv = jnp.sum(valid)
    dtv = jnp.where(valid, t[2] - pt, 1.0)
    log_dt = jnp.log10(jnp.maximum(dtv, 1e-10))
    log_f = jnp.log10(jnp.maximum(jnp.where(valid, f[2], 1.0), 1e-10))
    alpha, ic = M.linfit(log_dt, log_f, valid)
    chi2 = M.mean((log_f - (alpha * log_dt + ic)) ** 2, valid)
    good = ok8 & (npost >= 5) & (pf > 0) & (nvv >= 4)
    feats["r_tde_deviation_53"] = jnp.where(good, jnp.abs(alpha + 5.0 / 3.0), jnp.nan)
    feats["r_tde_deviation_512"] = jnp.where(good, jnp.abs(alpha + 5.0 / 12.0), jnp.nan)
    feats["r_best_power_law"] = jnp.where(good, alpha, jnp.nan)
    feats["r_power_law_chi2"] = jnp.where(good, chi2, jnp.nan)

    # --- flux stability (r, g) -------------------------------------------
    for bi, bname in ((2, "r"), (1, "g")):
        ok10 = nb[bi] >= 10
        pk = M.argmax(f[bi], mask[bi])
        post = mask[bi] & (idx_t >= pk)
        npost = jnp.sum(post)
        good = ok10 & (npost >= 5)

        pair = post[1:] & post[:-1]
        diffs = jnp.where(pair, f[bi][1:] - f[bi][:-1], 0.0)
        d_sd = M.std(diffs, pair, 0)
        mean_f = M.mean(f[bi], post)
        feats[f"{bname}_pt_scatter"] = jnp.where(
            good & (mean_f > 0), d_sd / jnp.where(mean_f > 0, mean_f, 1.0), jnp.nan)
        ndec = jnp.sum(jnp.where(pair, (diffs < 0).astype(f.dtype), 0.0))
        npairs = jnp.sum(pair)
        feats[f"{bname}_monotonicity"] = jnp.where(
            good, ndec / jnp.maximum(npairs, 1), jnp.nan)
        exp_sc = jnp.sqrt(M.mean(e[bi] ** 2, post))
        feats[f"{bname}_noise_ratio"] = jnp.where(
            good & (exp_sc > 0), d_sd / jnp.sqrt(2.0) / jnp.where(exp_sc > 0, exp_sc, 1.0),
            jnp.nan)

        # 3-point moving average with reflect edges over the post suffix
        n = M.count(mask[bi])
        lo = pk
        hi = n - 1
        il = jnp.clip(idx_t - 1, lo, hi)
        ir = jnp.clip(idx_t + 1, lo, hi)
        sm = (f[bi][il] + f[bi] + f[bi][ir]) / 3.0
        res = jnp.where(post, f[bi] - sm, 0.0)
        f_sd = M.std(f[bi], post, 0)
        score = 1.0 - M.std(res, post, 0) / jnp.where(f_sd > 0, f_sd, 1.0)
        feats[f"{bname}_smooth_score"] = jnp.where(good & (f_sd > 0), score, jnp.nan)

    return feats


extract = vmap_features(_kernel)
