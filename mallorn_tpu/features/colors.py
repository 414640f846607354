"""Color evolution features: colors at epochs relative to peak, slopes,
variability, temperature proxies.

Masked-kernel re-design of reference src/features/colors.py. Semantics:

- reference peak epoch: r-band argmax, falling back to g then i (:131-150);
- colors -2.5*log10(f1/f2) for pairs (g,r),(r,i),(u,g),(i,z) at 10 epochs
  via gap-limited (50 d) linear interpolation (:154-189, ops.masked.interp_at);
- instantaneous color std/range: band2 interpolated at band1's times with
  a 5 d gap limit, >= 3 pairs required (:209-232);
- peak fluxes/ratios/lags (:234-257), curvature (:263-275),
  late-time stability (:279-293);
- empirical temperature map T = 7000/(g-r+0.6) clamped to [3000, 50000]
  outside (-0.5, 2.0), with slopes and stability (:297-342).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M
from mallorn_tpu.utils.constants import LSST_BANDS

COLOR_PAIRS = ((1, 2, "g_r"), (2, 3, "r_i"), (0, 1, "u_g"), (3, 4, "i_z"))
EPOCHS = (("peak", 0.0), ("post_10d", 10.0), ("post_20d", 20.0),
          ("post_30d", 30.0), ("post_50d", 50.0), ("post_75d", 75.0),
          ("post_100d", 100.0), ("post_150d", 150.0), ("pre_10d", -10.0),
          ("pre_20d", -20.0))


def _color(f1, f2):
    ok = ~jnp.isnan(f1) & ~jnp.isnan(f2) & (f1 > 0) & (f2 > 0)
    return jnp.where(ok, -2.5 * jnp.log10(jnp.where(ok, f1, 1.0)
                                          / jnp.where(ok, f2, 1.0)), jnp.nan)


def _temp_from_gr(c):
    t = 7000.0 / (c + 0.6)
    t = jnp.where(c < -0.5, 50000.0, t)
    t = jnp.where(c > 2.0, 3000.0, t)
    return jnp.where(jnp.isnan(c), jnp.nan, t)


def _nan_stats(vals):
    m = ~jnp.isnan(vals)
    n = jnp.sum(m, axis=-1)
    mu = jnp.sum(jnp.where(m, vals, 0.0), -1) / jnp.maximum(n, 1)
    var = jnp.sum(jnp.where(m, (vals - mu[..., None]) ** 2, 0.0), -1) / jnp.maximum(n, 1)
    return mu, jnp.sqrt(var), n


def _kernel(v: ObjectView) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, mask = v.band_time, v.band_flux, v.band_mask
    nb = M.count(mask)  # [6]

    # reference peak: r then g then i (argmax over any observations)
    pt, _ = _peak_t_f(t, f, mask)

    def band_peak(bi):
        return jnp.where(nb[bi] > 0, pt[bi], jnp.nan)

    ref_peak = band_peak(2)
    ref_peak = jnp.where(jnp.isnan(ref_peak), band_peak(1), ref_peak)
    ref_peak = jnp.where(jnp.isnan(ref_peak), band_peak(3), ref_peak)
    feats["peak_mjd"] = ref_peak  # offset added in extract()

    # interpolated flux per band at each epoch — ONE vmapped interp over
    # the 10 epoch targets: the interp body compiles once instead of 10x
    # (the unrolled loop dominated this kernel's executable size)
    import jax as _jax

    targets = ref_peak + jnp.asarray([dt for _, dt in EPOCHS], jnp.float32)
    fl_all = _jax.vmap(
        lambda tgt: M.interp_at(t, f, mask, tgt, max_gap=50.0))(targets)
    epoch_flux = {}
    for ei, (name, dt) in enumerate(EPOCHS):
        fl = fl_all[ei]  # [6]
        epoch_flux[name] = fl
        for b1, b2, pname in COLOR_PAIRS:
            feats[f"{pname}_{name}"] = _color(fl[b1], fl[b2])

    for b1, b2, pname in COLOR_PAIRS:
        cp = feats[f"{pname}_peak"]
        c50 = feats[f"{pname}_post_50d"]
        c100 = feats[f"{pname}_post_100d"]
        feats[f"{pname}_slope_50d"] = jnp.where(
            ~jnp.isnan(cp) & ~jnp.isnan(c50), (c50 - cp) / 50.0, jnp.nan)
        feats[f"{pname}_slope_100d"] = jnp.where(
            ~jnp.isnan(cp) & ~jnp.isnan(c100), (c100 - cp) / 100.0, jnp.nan)

    # instantaneous color variability: band2 interpolated at band1's times
    for b1, b2, pname in COLOR_PAIRS:
        f2 = M.interp_at(t[b2][None, :].repeat(t.shape[-1], 0),
                         f[b2][None, :].repeat(t.shape[-1], 0),
                         mask[b2][None, :].repeat(t.shape[-1], 0),
                         t[b1], max_gap=5.0)  # [T]
        c = _color(jnp.where(mask[b1], f[b1], jnp.nan), f2)
        valid = ~jnp.isnan(c)
        nv = jnp.sum(valid)
        mu, sd, _ = _nan_stats(c)
        rng_ = M.mmax(c, valid) - M.mmin(c, valid)
        both = (nb[b1] > 0) & (nb[b2] > 0)
        feats[f"{pname}_std"] = jnp.where(both & (nv >= 3), sd, jnp.nan)
        feats[f"{pname}_range"] = jnp.where(both & (nv >= 3), rng_, jnp.nan)

    # peak fluxes and ratios
    pf = M.mmax(f, mask)  # [6] NaN when band empty
    for bi, band in enumerate(LSST_BANDS):
        feats[f"{band}_peak_flux"] = pf[bi]
    for b1, b2, pname in COLOR_PAIRS:
        ok = ~jnp.isnan(pf[b1]) & (pf[b2] > 0)
        feats[f"{pname}_peak_flux_ratio"] = jnp.where(
            ok, pf[b1] / jnp.where(ok, pf[b2], 1.0), jnp.nan)

    for b1, b2, pname in ((1, 2, "g_r"), (2, 3, "r_i")):
        ok = (nb[b1] > 0) & (nb[b2] > 0)
        feats[f"{pname}_peak_lag"] = jnp.where(ok, pt[b1] - pt[b2], jnp.nan)

    # curvature from peak/30/75
    for b1, b2, pname in ((1, 2, "g_r"), (2, 3, "r_i")):
        cp = feats[f"{pname}_peak"]
        c30 = feats[f"{pname}_post_30d"]
        c75 = feats[f"{pname}_post_75d"]
        ok = ~(jnp.isnan(cp) | jnp.isnan(c30) | jnp.isnan(c75))
        s1 = (c30 - cp) / 30.0
        s2 = (c75 - c30) / 45.0
        feats[f"{pname}_curvature"] = jnp.where(ok, (s2 - s1) / 37.5, jnp.nan)

    # late-time stability over post 50/75/100/150
    for b1, b2, pname in ((1, 2, "g_r"), (2, 3, "r_i")):
        late = jnp.stack([feats[f"{pname}_post_50d"], feats[f"{pname}_post_75d"],
                          feats[f"{pname}_post_100d"], feats[f"{pname}_post_150d"]])
        mu, sd, n = _nan_stats(late)
        feats[f"{pname}_late_stability"] = jnp.where(n >= 2, sd, jnp.nan)
        feats[f"{pname}_late_mean"] = jnp.where(n >= 2, mu, jnp.nan)

    # temperature proxies from g-r
    temps = []
    for ep in ("peak", "post_30d", "post_75d", "post_150d"):
        tp = _temp_from_gr(feats[f"g_r_{ep}"])
        feats[f"temp_{ep}"] = tp
        temps.append(tp)
    t_peak, t30, t75, t150 = temps
    feats["temp_slope_early"] = jnp.where(
        ~jnp.isnan(t_peak) & ~jnp.isnan(t30), (t30 - t_peak) / 30.0, jnp.nan)
    feats["temp_slope_mid"] = jnp.where(
        ~jnp.isnan(t30) & ~jnp.isnan(t75), (t75 - t30) / 45.0, jnp.nan)
    feats["temp_slope_late"] = jnp.where(
        ~jnp.isnan(t75) & ~jnp.isnan(t150), (t150 - t75) / 75.0, jnp.nan)
    tv = jnp.stack(temps)
    mu, sd, n = _nan_stats(tv)
    feats["temp_stability"] = jnp.where(n >= 2, sd / mu, jnp.nan)

    return feats


def _peak_t_f(t, f, mask):
    idx = M.argmax(f, mask)
    pt = jnp.take_along_axis(t, idx[..., None], -1)[..., 0]
    pf = jnp.take_along_axis(f, idx[..., None], -1)[..., 0]
    any_ = M.count(mask) > 0
    return jnp.where(any_, pt, jnp.nan), jnp.where(any_, pf, jnp.nan)


_extract = vmap_features(_kernel)


def extract(packed, meta=None) -> FeatureSet:
    feats = _extract(packed)
    feats["peak_mjd"] = feats["peak_mjd"] + packed.time_offset
    return feats
