"""v35/43/73/74 Cesium-style single-band variability features.

Masked-kernel re-design of reference src/features/cesium_features.py:
per band (>= 5 points, else all NaN :357-376):

- Stetson J/K with the sqrt(n/(n-1)) bias factor and inverse-variance
  weights (:31-103);
- beyond 1/2 sigma fractions (population std, 0 when std == 0, :106-135);
- flux percentile ratios mid20/35/50/65/80 over the (5th, 95th) span
  (:138-173);
- percent amplitude (max - median)/|median| (:176-197);
- maximum slope with the dt <= 0 -> 1.0 divisor quirk (:200-233);
- inverse-variance weighted linear trend (:236-279);
- Anderson-Darling normality statistic (:282-308, scipy's estimated-
  parameters variant);
- cross-band Stetson-J consistency over g/r/i (:393-401).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M
from mallorn_tpu.utils.constants import LSST_BANDS

_BIG = 1.0e30

RATIOS = ((40.0, 60.0, "mid20"), (32.5, 67.5, "mid35"), (25.0, 75.0, "mid50"),
          (17.5, 82.5, "mid65"), (10.0, 90.0, "mid80"))


def _delta(f, e, mask):
    n = M.count(mask).astype(f.dtype)
    mu = M.mean(f, mask)
    bias = jnp.sqrt(n / jnp.maximum(n - 1.0, 1.0))
    return bias[..., None] * (f - mu[..., None]) / jnp.where(e > 0, e, 1.0)


def _stetson_j(f, e, mask):
    d = _delta(f, e, mask)
    w = 1.0 / jnp.where(e > 0, e * e, 1.0)
    num = jnp.sum(jnp.where(mask, w * d * jnp.sign(d), 0.0), -1)
    den = jnp.sum(jnp.where(mask, w, 0.0), -1)
    ok = (M.count(mask) >= 2) & (den != 0)
    return jnp.where(ok, num / jnp.where(den != 0, den, 1.0), jnp.nan)


def _stetson_k(f, e, mask):
    d = _delta(f, e, mask)
    n = jnp.maximum(M.count(mask), 1)
    num = jnp.sum(jnp.where(mask, jnp.abs(d), 0.0), -1) / n
    den = jnp.sqrt(jnp.sum(jnp.where(mask, d * d, 0.0), -1) / n)
    ok = (M.count(mask) >= 2) & (den != 0)
    return jnp.where(ok, num / jnp.where(den != 0, den, 1.0), jnp.nan)


def _beyond(f, mask, nsig):
    n = M.count(mask)
    v = M.beyond_nstd(f, mask, nsig)
    return jnp.where(n >= 3, v, jnp.nan)


def _pct_ratio(f, mask, lo, hi):
    n = M.count(mask)
    den = M.quantile(f, mask, 0.95) - M.quantile(f, mask, 0.05)
    num = M.quantile(f, mask, hi / 100.0) - M.quantile(f, mask, lo / 100.0)
    ok = (n >= 5) & (den != 0)
    return jnp.where(ok, num / jnp.where(den != 0, den, 1.0), jnp.nan)


def _percent_amplitude(f, mask):
    n = M.count(mask)
    med = M.median(f, mask)
    ok = (n >= 2) & (med != 0)
    return jnp.where(ok, (M.mmax(f, mask) - med) / jnp.abs(jnp.where(med != 0, med, 1.0)),
                     jnp.nan)


def _maximum_slope(t, f, mask):
    pair = mask[..., 1:] & mask[..., :-1]
    dt = t[..., 1:] - t[..., :-1]
    dt = jnp.where(dt > 0, dt, 1.0)  # reference quirk: dt<=0 -> divisor 1
    sl = jnp.abs(f[..., 1:] - f[..., :-1]) / dt
    v = jnp.max(jnp.where(pair, sl, -_BIG), -1)
    ok = M.count(mask) >= 2
    return jnp.where(ok & jnp.any(pair, -1), v, jnp.nan)


def _linear_trend(t, f, e, mask):
    n = M.count(mask)
    w = jnp.where(mask, 1.0 / jnp.where(e > 0, e * e, 1.0), 0.0)
    ws = jnp.sum(w, -1)
    tm = t - M.mean(t, mask)[..., None]
    tw = jnp.sum(w * tm, -1) / jnp.where(ws > 0, ws, 1.0)
    fw = jnp.sum(w * f, -1) / jnp.where(ws > 0, ws, 1.0)
    num = jnp.sum(w * (tm - tw[..., None]) * (f - fw[..., None]), -1)
    den = jnp.sum(w * (tm - tw[..., None]) ** 2, -1)
    ok = (n >= 3) & (den != 0)
    return jnp.where(ok, num / jnp.where(den != 0, den, 1.0), jnp.nan)


def _anderson_darling(f, mask):
    """A^2 for normality with estimated parameters (scipy.stats.anderson)."""
    n = M.count(mask)
    nf = n.astype(f.dtype)
    mu = M.mean(f, mask)
    sd = M.std(f, mask, ddof=1)
    z = (f - mu[..., None]) / jnp.where(sd[..., None] > 0, sd[..., None], 1.0)
    zs = jnp.sort(jnp.where(mask, z, _BIG), axis=-1)  # valid ascending first
    T = f.shape[-1]
    i = jnp.arange(1, T + 1, dtype=f.dtype)
    valid = i[None, :] <= nf[..., None] if f.ndim > 1 else i <= nf
    logcdf = jax.scipy.stats.norm.logcdf(zs)
    # reversed order within the valid prefix: element (n+1-i)
    rev_idx = jnp.clip(nf[..., None] - i[None, :] if f.ndim > 1 else nf - i,
                       0, T - 1).astype(jnp.int32)
    zrev = jnp.take_along_axis(zs, rev_idx, -1) if f.ndim > 1 else zs[rev_idx]
    logsf = jax.scipy.stats.norm.logcdf(-zrev)
    s = jnp.sum(jnp.where(valid, (2.0 * i - 1.0) * (logcdf + logsf), 0.0), -1)
    a2 = -nf - s / jnp.maximum(nf, 1.0)
    return jnp.where((n >= 5) & (sd > 0), a2, jnp.nan)


def _kernel(v: ObjectView) -> FeatureSet:
    t, f, e, mask = v.band_time, v.band_flux, v.band_err, v.band_mask
    nb = M.count(mask)
    ok5 = nb >= 5
    bm = mask & ok5[:, None]

    vals = {
        "cesium_stetson_j": _stetson_j(f, e, bm),
        "cesium_stetson_k": _stetson_k(f, e, bm),
        "cesium_beyond_1std": _beyond(f, bm, 1.0),
        "cesium_beyond_2std": _beyond(f, bm, 2.0),
    }
    for lo, hi, name in RATIOS:
        vals[f"cesium_flux_percentile_ratio_{name}"] = _pct_ratio(f, bm, lo, hi)
    vals["cesium_percent_amplitude"] = _percent_amplitude(f, bm)
    vals["cesium_maximum_slope"] = _maximum_slope(t, f, bm)
    vals["cesium_linear_trend"] = _linear_trend(t, f, e, bm)
    vals["cesium_anderson_darling"] = _anderson_darling(f, bm)

    feats: FeatureSet = {}
    for bi, band in enumerate(LSST_BANDS):
        for key, val in vals.items():
            feats[f"{band}_{key}"] = jnp.where(ok5[bi], val[bi], jnp.nan)

    sj = jnp.where(ok5[1:4], vals["cesium_stetson_j"][1:4], jnp.nan)
    m = ~jnp.isnan(sj)
    n = jnp.sum(m)
    mu = jnp.sum(jnp.where(m, sj, 0.0)) / jnp.maximum(n, 1)
    sd = jnp.sqrt(jnp.sum(jnp.where(m, (sj - mu) ** 2, 0.0)) / jnp.maximum(n, 1))
    abs_mu = jnp.sum(jnp.where(m, jnp.abs(sj), 0.0)) / jnp.maximum(n, 1)
    feats["cesium_stetson_j_consistency"] = jnp.where(n >= 2, sd / abs_mu, jnp.nan)

    b1 = jnp.where(ok5, vals["cesium_beyond_1std"], jnp.nan)
    bm1 = ~jnp.isnan(b1)
    nb1 = jnp.sum(bm1)
    feats["cesium_avg_beyond_1std"] = jnp.where(
        nb1 > 0, jnp.sum(jnp.where(bm1, b1, 0.0)) / jnp.maximum(nb1, 1), jnp.nan)
    return feats


extract = vmap_features(_kernel)
