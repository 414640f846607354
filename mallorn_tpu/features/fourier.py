"""v40 Fourier features: dominant frequency/power, power ratio, spectral
entropy per band.

Re-design of reference src/features/fourier_features.py:16-131. The
reference's variable-length FFT (n_samples = min(n, 128)) becomes an
explicit masked DFT — two [128, 128] trig matmuls per lane (MXU-friendly),
which keeps every lane the same static shape while computing the exact
S-point transform:
- uniform grid linspace(t_min, t_max, S), np.interp values;
- mean removal + Hanning window (0.5 - 0.5 cos(2 pi k/(S-1)));
- power spectrum over positive frequencies j in [1, S//2);
- entropy normalized by log2(#bins above 1e-10 of the normalized power).
Guard: band needs >= 10 points.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M
from mallorn_tpu.features.research import _np_interp
from mallorn_tpu.utils.constants import LSST_BANDS

S_MAX = 128
FEATURE_KEYS = ("fourier_dominant_freq", "fourier_dominant_power",
                "fourier_power_ratio", "fourier_spectral_entropy")


def _band_fourier(t, f, mask):
    """One band row [T] -> dict of 4 scalars."""
    n = M.count(mask)
    S = jnp.minimum(n, S_MAX).astype(jnp.float32)
    ok = n >= 10

    t0 = M.mmin(t, mask)
    t1 = M.mmax(t, mask)
    k = jnp.arange(S_MAX, dtype=jnp.float32)
    grid = t0 + k * (t1 - t0) / jnp.maximum(S - 1.0, 1.0)
    x = _np_interp(grid, t, f, mask)
    kmask = k < S

    mu = jnp.sum(jnp.where(kmask, x, 0.0)) / jnp.maximum(S, 1.0)
    x = jnp.where(kmask, x - mu, 0.0)
    window = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / jnp.maximum(S - 1.0, 1.0))
    x = x * jnp.where(kmask, window, 0.0)

    # masked S-point DFT via explicit trig matrices
    j = jnp.arange(S_MAX, dtype=jnp.float32)
    ang = 2.0 * jnp.pi * jnp.outer(j, k) / jnp.maximum(S, 1.0)
    re = jnp.cos(ang) @ x
    im = -jnp.sin(ang) @ x
    power = re * re + im * im

    half = jnp.floor(S / 2.0)
    jmask = (j >= 1) & (j < half)
    any_j = jnp.any(jmask) & (jnp.max(jnp.where(jmask, power, 0.0)) > 0)

    dt = (t1 - t0) / jnp.maximum(S - 1.0, 1.0)
    freqs = j / (S * jnp.maximum(dt, 1e-10))

    pj = jnp.where(jmask, power, -jnp.inf)
    dom = jnp.argmax(pj)
    dominant_freq = jnp.abs(freqs[dom])
    dominant_power = power[dom]
    nj = jnp.sum(jmask)
    mean_power = jnp.sum(jnp.where(jmask, power, 0.0)) / jnp.maximum(nj, 1)
    power_ratio = dominant_power / (mean_power + 1e-10)

    psum = jnp.sum(jnp.where(jmask, power, 0.0))
    pn = jnp.where(jmask, power, 0.0) / (psum + 1e-10)
    nz = jmask & (pn > 1e-10)
    ent = -jnp.sum(jnp.where(nz, pn * jnp.log2(pn + 1e-10), 0.0))
    max_ent = jnp.log2(jnp.maximum(jnp.sum(nz).astype(jnp.float32), 1.0))
    entropy = jnp.where(max_ent > 0, ent / max_ent, ent)

    valid = ok & any_j
    return {
        "fourier_dominant_freq": jnp.where(valid, dominant_freq, jnp.nan),
        "fourier_dominant_power": jnp.where(valid, dominant_power, jnp.nan),
        "fourier_power_ratio": jnp.where(valid, power_ratio, jnp.nan),
        "fourier_spectral_entropy": jnp.where(valid, entropy, jnp.nan),
    }


def _kernel(v: ObjectView) -> FeatureSet:
    import jax

    per_band = jax.vmap(_band_fourier)(v.band_time, v.band_flux, v.band_mask)
    feats: FeatureSet = {}
    for bi, band in enumerate(LSST_BANDS):
        for key in FEATURE_KEYS:
            feats[f"{band}_{key}"] = per_band[key][bi]
    return feats


extract = vmap_features(_kernel)
