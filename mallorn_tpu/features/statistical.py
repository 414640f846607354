"""Per-band + aggregate statistical features.

TPU re-design of the reference's per-object Python loop
(reference: src/features/statistical.py): the 17 per-band statistics are
computed for all 6 bands at once as masked reductions over the packed
``[6, T]`` view, vmapped over all objects — one fused XLA computation for
the whole dataset instead of ~61k pandas group visits.

Feature-name and NaN/default semantics follow the reference exactly:
- missing band (n==0): n_obs=0, everything else NaN      (:56-66)
- std: population std for n>1 else 0                      (:71)
- skew/kurt: hand-rolled, 0 under the guards              (:14-35, 77-82)
- iqr 0 for n==1; beyond_* 0 for zero std                 (:87-96)
- max_slope over time-sorted consecutive pairs with dt>0  (:98-113)
- mean_snr over err>0 points, NaN if none                 (:115-120)
- cross-band flux ratios and peak_band                    (:199-222)
- metadata: Z, EBV, luminosity_distance=Z*4280, time_dilation=1+Z (:229-253)
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M
from mallorn_tpu.utils.constants import LSST_BANDS

STAT_NAMES = (
    "n_obs", "mean", "std", "min", "max", "median", "skew", "kurtosis",
    "amplitude", "mad", "iqr", "beyond_1std", "beyond_2std", "max_slope",
    "mean_snr", "time_span", "cadence_mean",
)


def _series_stats(t, f, e, mask) -> Dict[str, jnp.ndarray]:
    """Stats for time-sorted (t, f, e, mask) rows; reduces the last axis.

    Works for both the [6, T] per-band view (returns [6]-vectors) and the
    [TA] all-band view (returns scalars).
    """
    n = M.count(mask)
    nf = n.astype(f.dtype)
    empty = n == 0

    mean_ = M.mean(f, mask)
    std_ = jnp.where(n > 1, M.std(f, mask, ddof=0), 0.0)
    out = {
        "n_obs": nf,
        "mean": mean_,
        "std": std_,
        "min": M.mmin(f, mask),
        "max": M.mmax(f, mask),
        "median": M.median(f, mask),
        "skew": jnp.where(n > 2, M.skewness(f, mask), 0.0),
        "kurtosis": jnp.where(n > 2, M.kurtosis(f, mask), 0.0),
    }
    out["amplitude"] = out["max"] - out["min"]
    out["mad"] = M.mad(f, mask)
    out["iqr"] = jnp.where(n > 1, M.iqr(f, mask), 0.0)
    out["beyond_1std"] = M.beyond_nstd(f, mask, 1.0)
    out["beyond_2std"] = M.beyond_nstd(f, mask, 2.0)

    # max |df/dt| over consecutive (time-sorted) pairs with dt > 0
    dt = t[..., 1:] - t[..., :-1]
    df = f[..., 1:] - f[..., :-1]
    pair = mask[..., 1:] & mask[..., :-1]
    valid = pair & (dt > 0)
    slopes = jnp.where(valid, jnp.abs(df) / jnp.where(valid, dt, 1.0), -1.0)
    ms = jnp.max(slopes, axis=-1)
    out["max_slope"] = jnp.where((n > 1) & jnp.any(valid, axis=-1), ms, 0.0)

    snr_mask = mask & (e > 0)
    out["mean_snr"] = M.mean(jnp.abs(f) / jnp.where(e > 0, e, 1.0), snr_mask)

    span = M.mmax(t, mask) - M.mmin(t, mask)
    out["time_span"] = jnp.where(n > 1, span, 0.0)
    cad = M.mean(jnp.where(pair, dt, 0.0), pair)
    out["cadence_mean"] = jnp.where(n > 1, cad, 0.0)

    # Missing series: n_obs stays 0, the rest NaN (reference :56-66).
    for k in out:
        if k != "n_obs":
            out[k] = jnp.where(empty, jnp.nan, out[k])
    return out


def _kernel(v: ObjectView) -> FeatureSet:
    feats: FeatureSet = {}

    band_stats = _series_stats(v.band_time, v.band_flux, v.band_err, v.band_mask)
    for bi, band in enumerate(LSST_BANDS):
        for name in STAT_NAMES:
            feats[f"{band}_{name}"] = band_stats[name][bi]

    all_stats = _series_stats(v.all_time, v.all_flux, v.all_err, v.all_mask)
    for name in STAT_NAMES:
        feats[f"all_{name}"] = all_stats[name]

    means = band_stats["mean"]  # [6] u,g,r,i,z,y
    maxes = band_stats["max"]

    def ratio(a, b):
        ok = ~jnp.isnan(a) & (b > 0)
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), jnp.nan)

    feats["flux_ratio_g_r"] = ratio(means[1], means[2])
    feats["flux_ratio_r_i"] = ratio(means[2], means[3])
    feats["flux_ratio_i_z"] = ratio(means[3], means[4])

    any_band = jnp.any(~jnp.isnan(maxes))
    peak_band = jnp.argmax(jnp.where(jnp.isnan(maxes), -jnp.inf, maxes))
    feats["peak_band"] = jnp.where(any_band, peak_band, -1).astype(jnp.float32)

    return feats


_extract = vmap_features(_kernel)


def extract(packed, meta=None) -> FeatureSet:
    """Statistical features; appends metadata features when meta is given."""
    feats = _extract(packed)
    if meta is not None:
        z = jnp.asarray(meta.z)
        feats["Z"] = z
        feats["EBV"] = jnp.asarray(meta.ebv)
        feats["luminosity_distance"] = z * 4280.0  # approx Mpc, reference :250
        feats["time_dilation"] = 1.0 + z
    return feats
