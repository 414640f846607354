"""Lightcurve augmentation: the capabilities of the reference's three
augmentation modules as masked transforms over packed tensors.

Covers (all documented LB-negative in the reference, kept for capability
parity — SURVEY.md §2.3):
- src/features/augmentation.py (v50-53 LightcurveAugmenter :22-188):
  flux scaling, time stretch, noise injection, observation dropout,
  time shift; TDE mixup (:189-239); dataset expansion (:240-437);
- src/features/gp_augmentation.py (v18-era :28-96): time shift ±20 d,
  random 10-30% observation removal, S/N degradation;
- src/features/plasticc_augmentation.py (v71 :63-189): redshift
  augmentation (time dilation + d_L^2 flux scaling), per-band skew,
  quality degradation.

Everything is vectorized over the object axis with jax.random — one
fused transform per batch instead of per-object Python loops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.data.packing import Metadata, PackedLightcurves


def _map_views(packed: PackedLightcurves, fn_band, fn_all):
    """Apply (t, f, e, mask) -> (t, f, e) transforms to both views."""
    bt, bf, be = fn_band(packed.band_time, packed.band_flux, packed.band_err,
                         packed.band_mask)
    a_args = fn_all(packed.all_time, packed.all_flux, packed.all_err,
                    packed.all_mask)
    return packed._replace(band_time=bt, band_flux=bf, band_err=be,
                           all_time=a_args[0], all_flux=a_args[1],
                           all_err=a_args[2])


def flux_scale(packed: PackedLightcurves, key, lo: float = 0.8,
               hi: float = 1.2) -> PackedLightcurves:
    """Per-object multiplicative flux scaling (augmentation.py:52-66)."""
    s = jax.random.uniform(key, (packed.n_objects,), minval=lo, maxval=hi)

    def band(t, f, e, m):
        return t, f * s[:, None, None], e * s[:, None, None]

    def al(t, f, e, m):
        return t, f * s[:, None], e * s[:, None]

    return _map_views(packed, band, al)


def time_stretch(packed: PackedLightcurves, key, lo: float = 0.9,
                 hi: float = 1.1) -> PackedLightcurves:
    """Per-object time stretch about the first observation (:68-86)."""
    s = jax.random.uniform(key, (packed.n_objects,), minval=lo, maxval=hi)

    def stretch(t, m, sb):
        t0 = jnp.min(jnp.where(m, t, jnp.inf), axis=-1, keepdims=True)
        t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
        return jnp.where(m, t0 + (t - t0) * sb, t)

    def band(t, f, e, m):
        return stretch(t, m, s[:, None, None]), f, e

    def al(t, f, e, m):
        return stretch(t, m, s[:, None]), f, e

    return _map_views(packed, band, al)


def time_shift(packed: PackedLightcurves, key, max_shift: float = 20.0
               ) -> PackedLightcurves:
    """Uniform ±max_shift day shift (gp_augmentation.py:28-43)."""
    d = jax.random.uniform(key, (packed.n_objects,), minval=-max_shift,
                           maxval=max_shift)

    def band(t, f, e, m):
        return jnp.where(m, t + d[:, None, None], t), f, e

    def al(t, f, e, m):
        return jnp.where(m, t + d[:, None], t), f, e

    return _map_views(packed, band, al)


def noise_injection(packed: PackedLightcurves, key, scale: float = 0.5
                    ) -> PackedLightcurves:
    """Gaussian noise at `scale` x flux_err (augmentation.py:88-101)."""
    k1, k2 = jax.random.split(key)

    def band(t, f, e, m):
        n = jax.random.normal(k1, f.shape) * e * scale
        return t, jnp.where(m, f + n, f), e

    def al(t, f, e, m):
        n = jax.random.normal(k2, f.shape) * e * scale
        return t, jnp.where(m, f + n, f), e

    return _map_views(packed, band, al)


def observation_dropout(packed: PackedLightcurves, key, frac: float = 0.2,
                        min_keep: int = 5) -> PackedLightcurves:
    """Randomly mask out `frac` of observations, keeping at least
    `min_keep` per band (augmentation.py:103-132, gp_augmentation.py:44-66).
    Masks are updated; values stay in place (mask-aware kernels ignore them)."""
    k1, k2 = jax.random.split(key)

    def drop(mask, k):
        u = jax.random.uniform(k, mask.shape)
        keep = mask & (u > frac)
        # keep at least min_keep: rank each valid obs by u, keep smallest
        order_rank = jnp.sum(
            (u[..., None, :] < u[..., :, None]) & mask[..., None, :], axis=-1)
        forced = mask & (order_rank < min_keep)
        return keep | forced

    bm = drop(packed.band_mask, k1)
    am = drop(packed.all_mask, k2)
    return packed._replace(band_mask=bm, all_mask=am)


def snr_degradation(packed: PackedLightcurves, key, factor_lo: float = 1.2,
                    factor_hi: float = 2.0) -> PackedLightcurves:
    """Inflate errors + renoise (gp_augmentation.py:67-96)."""
    k0, k1, k2 = jax.random.split(key, 3)
    fac = jax.random.uniform(k0, (packed.n_objects,), minval=factor_lo,
                             maxval=factor_hi)

    def band(t, f, e, m):
        e2 = e * fac[:, None, None]
        extra = jnp.sqrt(jnp.maximum(e2 ** 2 - e ** 2, 0.0))
        n = jax.random.normal(k1, f.shape) * extra
        return t, jnp.where(m, f + n, f), jnp.where(m, e2, e)

    def al(t, f, e, m):
        e2 = e * fac[:, None]
        extra = jnp.sqrt(jnp.maximum(e2 ** 2 - e ** 2, 0.0))
        n = jax.random.normal(k2, f.shape) * extra
        return t, jnp.where(m, f + n, f), jnp.where(m, e2, e)

    return _map_views(packed, band, al)


def redshift_augment(packed: PackedLightcurves, meta: Metadata, key,
                     dz_lo: float = -0.05, dz_hi: float = 0.1
                     ) -> Tuple[PackedLightcurves, Metadata]:
    """Shift objects in redshift: time dilation x (1+z')/(1+z) and flux
    x (d_L(z)/d_L(z'))^2 (plasticc_augmentation.py:63-119)."""
    z = jnp.asarray(meta.z)
    dz = jax.random.uniform(key, z.shape, minval=dz_lo, maxval=dz_hi)
    z_new = jnp.clip(z + dz, 0.01, 3.0)

    def dl(zz):  # low-z luminosity distance approximation
        return (299792.458 / 70.0) * zz * (1.0 + zz / 2.0)

    dil = (1.0 + z_new) / (1.0 + z)
    fscale = (dl(z) / dl(z_new)) ** 2

    def band(t, f, e, m):
        t0 = jnp.min(jnp.where(m, t, jnp.inf), -1, keepdims=True)
        t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
        tt = jnp.where(m, t0 + (t - t0) * dil[:, None, None], t)
        return tt, f * fscale[:, None, None], e * fscale[:, None, None]

    def al(t, f, e, m):
        t0 = jnp.min(jnp.where(m, t, jnp.inf), -1, keepdims=True)
        t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
        tt = jnp.where(m, t0 + (t - t0) * dil[:, None], t)
        return tt, f * fscale[:, None], e * fscale[:, None]

    new_packed = _map_views(packed, band, al)
    new_meta = Metadata(object_ids=meta.object_ids, z=np.asarray(z_new),
                        ebv=meta.ebv, target=meta.target,
                        spec_type=meta.spec_type)
    return new_packed, new_meta


def tde_mixup(packed: PackedLightcurves, meta: Metadata, key,
              alpha: float = 0.3) -> PackedLightcurves:
    """Blend pairs of TDE lightcurves (augmentation.py:189-239): convex
    flux combination of two TDEs with matched padding shapes."""
    y = jnp.asarray(meta.target)
    tde_idx = jnp.nonzero(y == 1, size=len(y), fill_value=0)[0]
    n_tde = jnp.sum(y == 1)
    k1, k2 = jax.random.split(key)
    perm = jax.random.permutation(k1, tde_idx)
    lam = jax.random.beta(k2, alpha, alpha, (packed.n_objects,))

    def mix(x):
        partner = x[perm[jnp.arange(packed.n_objects) % jnp.maximum(n_tde, 1)]]
        l = lam.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where((y == 1).reshape((-1,) + (1,) * (x.ndim - 1)),
                         l * x + (1 - l) * partner, x)

    return packed._replace(band_flux=mix(packed.band_flux),
                           all_flux=mix(packed.all_flux))


def augment_dataset(packed: PackedLightcurves, meta: Metadata, key,
                    n_copies: int = 1) -> Tuple[PackedLightcurves, Metadata]:
    """Dataset expansion (augmentation.py:240-437): concat `n_copies`
    randomly-transformed copies onto the originals."""
    parts = [packed]
    metas = [meta]
    for c in range(n_copies):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        aug = flux_scale(packed, k1)
        aug = time_stretch(aug, k2)
        aug = noise_injection(aug, k3)
        aug = observation_dropout(aug, k4)
        parts.append(aug)
        metas.append(Metadata(
            object_ids=np.array([f"{o}_aug{c}" for o in meta.object_ids]),
            z=meta.z, ebv=meta.ebv, target=meta.target,
            spec_type=meta.spec_type))

    out = PackedLightcurves(
        *[jnp.concatenate([getattr(p, fld) for p in parts], axis=0)
          for fld in PackedLightcurves._fields[:-1]],
        time_offset=packed.time_offset)
    mo = Metadata(
        object_ids=np.concatenate([m.object_ids for m in metas]),
        z=np.concatenate([m.z for m in metas]),
        ebv=np.concatenate([m.ebv for m in metas]),
        target=np.concatenate([m.target for m in metas]) if meta.target is not None else None,
        spec_type=None)
    return out, mo
