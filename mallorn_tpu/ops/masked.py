"""Masked reductions and order statistics over padded arrays.

Every per-object kernel in the feature layer is built from these
primitives. Conventions:

- Inputs are ``(x, mask)`` pairs of equal shape; reductions are over the
  last axis unless noted. Masked-out lanes never contribute.
- An empty reduction returns NaN (the reference's missing-band semantics,
  src/features/statistical.py:56-66) unless a dedicated default is part of
  the reference contract (those live in the feature layer, not here).
- Statistics match NumPy semantics: ``std`` is population std (ddof=0,
  np.std default), ``median``/``percentile`` use linear interpolation.

All functions are jit/vmap-safe: static shapes, no data-dependent control
flow.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = 1.0e30


def count(mask):
    return jnp.sum(mask, axis=-1)


def msum(x, mask):
    return jnp.sum(jnp.where(mask, x, 0.0), axis=-1)


def mean(x, mask):
    n = count(mask)
    return jnp.where(n > 0, msum(x, mask) / jnp.maximum(n, 1), jnp.nan)


def var(x, mask, ddof: int = 0):
    n = count(mask)
    mu = mean(x, mask)
    d = jnp.where(mask, x - mu[..., None], 0.0)
    ss = jnp.sum(d * d, axis=-1)
    denom = jnp.maximum(n - ddof, 1)
    return jnp.where(n > ddof, ss / denom, jnp.nan)


def std(x, mask, ddof: int = 0):
    return jnp.sqrt(var(x, mask, ddof))


def mmin(x, mask):
    v = jnp.min(jnp.where(mask, x, _BIG), axis=-1)
    return jnp.where(count(mask) > 0, v, jnp.nan)


def mmax(x, mask):
    v = jnp.max(jnp.where(mask, x, -_BIG), axis=-1)
    return jnp.where(count(mask) > 0, v, jnp.nan)


def argmax(x, mask):
    """Index of the max valid element (first on ties, like np.argmax)."""
    return jnp.argmax(jnp.where(mask, x, -_BIG), axis=-1)


def argmin(x, mask):
    return jnp.argmin(jnp.where(mask, x, _BIG), axis=-1)


def _sorted_valid(x, mask):
    """Sort with masked lanes pushed to the end. Returns (sorted_x, n)."""
    return jnp.sort(jnp.where(mask, x, _BIG), axis=-1), count(mask)


def quantile(x, mask, q: float):
    """np.percentile(x[mask], q*100) with linear interpolation."""
    xs, n = _sorted_valid(x, mask)
    # virtual index into the sorted valid prefix
    idx = q * (n.astype(xs.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(idx), 0, xs.shape[-1] - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(idx), 0, xs.shape[-1] - 1).astype(jnp.int32)
    w = idx - lo.astype(xs.dtype)
    x_lo = jnp.take_along_axis(xs, lo[..., None], axis=-1)[..., 0]
    x_hi = jnp.take_along_axis(xs, hi[..., None], axis=-1)[..., 0]
    v = x_lo * (1.0 - w) + x_hi * w
    return jnp.where(n > 0, v, jnp.nan)


def median(x, mask):
    return quantile(x, mask, 0.5)


def mad(x, mask):
    """Median absolute deviation about the median."""
    med = median(x, mask)
    return median(jnp.abs(x - med[..., None]), mask)


def iqr(x, mask):
    return quantile(x, mask, 0.75) - quantile(x, mask, 0.25)


def skewness(x, mask):
    """Hand-rolled skew matching reference statistical.py:14-23:
    0 for n<3 or zero std; population moments otherwise."""
    n = count(mask)
    mu = mean(x, mask)
    sd = std(x, mask, ddof=0)
    zn = jnp.where(mask, (x - mu[..., None]) / jnp.where(sd[..., None] > 0, sd[..., None], 1.0), 0.0)
    m3 = jnp.sum(zn ** 3, axis=-1) / jnp.maximum(n, 1)
    return jnp.where((n >= 3) & (sd > 0), m3, 0.0)


def kurtosis(x, mask):
    """Excess kurtosis matching reference statistical.py:26-35."""
    n = count(mask)
    mu = mean(x, mask)
    sd = std(x, mask, ddof=0)
    zn = jnp.where(mask, (x - mu[..., None]) / jnp.where(sd[..., None] > 0, sd[..., None], 1.0), 0.0)
    m4 = jnp.sum(zn ** 4, axis=-1) / jnp.maximum(n, 1)
    return jnp.where((n >= 4) & (sd > 0), m4 - 3.0, 0.0)


def beyond_nstd(x, mask, nsig: float):
    """Fraction of valid points with |z| > nsig (0 when std == 0)."""
    n = count(mask)
    mu = mean(x, mask)
    sd = std(x, mask, ddof=0)
    z = jnp.abs(x - mu[..., None]) / jnp.where(sd[..., None] > 0, sd[..., None], 1.0)
    frac = jnp.sum(jnp.where(mask, (z > nsig).astype(x.dtype), 0.0), axis=-1) / jnp.maximum(n, 1)
    return jnp.where(sd > 0, frac, 0.0)


def weighted_mean(x, w, mask):
    sw = jnp.sum(jnp.where(mask, w, 0.0), axis=-1)
    return jnp.where(sw > 0, jnp.sum(jnp.where(mask, x * w, 0.0), axis=-1) / jnp.where(sw > 0, sw, 1.0), jnp.nan)


def nanify(x, cond):
    """Return x where cond else NaN (the ubiquitous guard pattern)."""
    return jnp.where(cond, x, jnp.nan)


def linfit(x, y, mask):
    """Masked least-squares line fit y ~ a*x + b (np.polyfit deg=1).

    Returns (slope, intercept); NaN when fewer than 2 valid points or
    degenerate x.
    """
    n = count(mask)
    xm = mean(x, mask)
    ym = mean(y, mask)
    dx = jnp.where(mask, x - xm[..., None], 0.0)
    dy = jnp.where(mask, y - ym[..., None], 0.0)
    sxx = jnp.sum(dx * dx, axis=-1)
    sxy = jnp.sum(dx * dy, axis=-1)
    slope = jnp.where(sxx > 0, sxy / jnp.where(sxx > 0, sxx, 1.0), jnp.nan)
    intercept = ym - slope * xm
    bad = (n < 2) | ~jnp.isfinite(slope)
    return jnp.where(bad, jnp.nan, slope), jnp.where(bad, jnp.nan, intercept)


def interp_at(times, values, mask, target_time, max_gap: float = 50.0):
    """Gap-limited linear interpolation at ``target_time``.

    Matches reference colors.py:47-89 exactly:
    - NaN when fewer than 2 valid points,
    - NaN when target outside [t_min, t_max],
    - NaN when the bracketing gap exceeds ``max_gap``,
    - endpoint value when the target exactly hits the first/last time.

    ``times`` must be time-sorted within the valid prefix (the packer
    guarantees this). target_time may be NaN -> NaN out.
    """
    n = count(mask)
    t = jnp.where(mask, times, _BIG)
    tt = jnp.asarray(target_time)[..., None]  # [..., 1] vs t [..., T]
    # index of first valid time >= target (np.searchsorted 'left').
    # The mask may be any CONTIGUOUS run of the time-sorted row (a prefix
    # or a window); idx-1 then stays inside the run whenever idx is not
    # its first element.
    ge = (t >= tt) & mask
    idx = jnp.argmax(ge, axis=-1)  # first True; 0 if none
    any_ge = jnp.any(ge, axis=-1)
    first_valid = jnp.argmax(mask, axis=-1)

    t_first = jnp.take_along_axis(t, first_valid[..., None], axis=-1)[..., 0]
    t_last = mmax(times, mask)

    lo = jnp.maximum(idx - 1, 0)
    t1 = jnp.take_along_axis(t, lo[..., None], axis=-1)[..., 0]
    t2 = jnp.take_along_axis(t, idx[..., None], axis=-1)[..., 0]
    f1 = jnp.take_along_axis(values, lo[..., None], axis=-1)[..., 0]
    f2 = jnp.take_along_axis(values, idx[..., None], axis=-1)[..., 0]

    dt = t2 - t1
    w = jnp.where(dt > 0, (target_time - t1) / jnp.where(dt > 0, dt, 1.0), 0.0)
    interp = f1 + w * (f2 - f1)

    # exact-left-endpoint: searchsorted lands on the first valid element
    at_start = idx == first_valid
    interp = jnp.where(at_start, f2, interp)

    invalid = (
        (n < 2)
        | jnp.isnan(target_time)
        | (target_time < t_first)
        | (target_time > t_last)
        | (~at_start & (dt > max_gap))
        | (~at_start & (dt <= 0))  # duplicate bracketing times -> NaN (np 0/0)
        | ~any_ge  # target beyond last valid point (guarded above too)
    )
    return jnp.where(invalid, jnp.nan, interp)


def value_at_nearest(times, values, mask, target_time, max_dt: float):
    """Value at the valid observation nearest to target_time, NaN if the
    nearest is farther than max_dt (reference physics_based.py:401-411)."""
    d = jnp.where(mask, jnp.abs(times - target_time), _BIG)
    i = jnp.argmin(d, axis=-1)
    dmin = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
    v = jnp.take_along_axis(values, i[..., None], axis=-1)[..., 0]
    ok = (count(mask) > 0) & (dmin < max_dt) & ~jnp.isnan(target_time)
    return jnp.where(ok, v, jnp.nan)
