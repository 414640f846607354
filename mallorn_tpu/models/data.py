"""Sequence batches for the deep-learning baselines.

The reference builds per-object padded sequences in a torch Dataset
(reference: src/models/lightcurve_dataset.py:24-188): per-step features
[normalized flux, normalized flux_err, delta-t], band index for the band
embedding, a padding mask, and per-object metadata (Z, EBV). Here the
packed all-band view IS already that padded sequence — building a batch
is pure masked array math, no per-object loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mallorn_tpu.data.packing import Metadata, PackedLightcurves


class SequenceBatch(NamedTuple):
    features: jnp.ndarray  # [N, T, 3] (norm flux, norm err, dt)
    band: jnp.ndarray  # [N, T] int band index (0 for padding)
    times: jnp.ndarray  # [N, T] days since first observation
    mask: jnp.ndarray  # [N, T] bool
    meta: jnp.ndarray  # [N, 2] (Z, EBV)
    label: Optional[jnp.ndarray]  # [N] or None


class BandBatch(NamedTuple):
    """Per-band padded view for band-parallel encoders (v27 GRU)."""

    features: jnp.ndarray  # [N, 6, T, 3] (norm flux, rel time/100, norm err)
    mask: jnp.ndarray  # [N, 6, T] bool
    meta: jnp.ndarray  # [N, 2] (Z, EBV)
    label: Optional[jnp.ndarray]  # [N] or None


def make_band_batch(packed: PackedLightcurves,
                    meta: Optional[Metadata] = None) -> BandBatch:
    """Band-separated sequences for the v27 GRU (reference
    scripts/train_v27_gru.py:188-200 stacks [flux, time, err] per band).
    Flux is normalized per object across all bands (shared scale keeps
    inter-band amplitude ratios); time is days since the object's first
    observation, /100."""
    t, f, e, m = (packed.band_time, packed.band_flux, packed.band_err,
                  packed.band_mask)
    n = jnp.maximum(m.sum(axis=(1, 2)), 1)
    mu = jnp.sum(jnp.where(m, f, 0.0), axis=(1, 2)) / n
    sd = jnp.sqrt(jnp.sum(jnp.where(m, (f - mu[:, None, None]) ** 2, 0.0),
                          axis=(1, 2)) / n)
    sd = jnp.where(sd > 0, sd, 1.0)[:, None, None]
    nf = jnp.where(m, (f - mu[:, None, None]) / sd, 0.0)
    ne = jnp.where(m, e / sd, 0.0)

    t0 = jnp.min(jnp.where(m, t, jnp.inf), axis=(1, 2))
    t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
    rel_t = jnp.where(m, (t - t0[:, None, None]) / 100.0, 0.0)

    features = jnp.stack([nf, rel_t, ne], axis=-1)
    if meta is not None:
        md = jnp.stack([jnp.asarray(meta.z), jnp.asarray(meta.ebv)], axis=1)
        label = jnp.asarray(meta.target) if meta.target is not None else None
    else:
        md = jnp.zeros((packed.n_objects, 2))
        label = None
    return BandBatch(features=features, mask=m, meta=md, label=label)


def make_sequence_batch(packed: PackedLightcurves,
                        meta: Optional[Metadata] = None) -> SequenceBatch:
    t, f, e, b, m = (packed.all_time, packed.all_flux, packed.all_err,
                     packed.all_band, packed.all_mask)
    t0 = jnp.min(jnp.where(m, t, jnp.inf), axis=1)
    t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
    rel_t = jnp.where(m, t - t0[:, None], 0.0)

    # per-object robust flux normalization (reference scales by the flux std)
    n = jnp.maximum(jnp.sum(m, axis=1), 1)
    mu = jnp.sum(jnp.where(m, f, 0.0), 1) / n
    sd = jnp.sqrt(jnp.sum(jnp.where(m, (f - mu[:, None]) ** 2, 0.0), 1) / n)
    sd = jnp.where(sd > 0, sd, 1.0)
    nf = jnp.where(m, (f - mu[:, None]) / sd[:, None], 0.0)
    ne = jnp.where(m, e / sd[:, None], 0.0)

    dt = jnp.diff(rel_t, axis=1, prepend=rel_t[:, :1])
    dt = jnp.where(m, dt, 0.0) / 100.0  # days -> O(1)

    features = jnp.stack([nf, ne, dt], axis=-1)
    band = jnp.where(m, jnp.clip(b, 0, 5), 0)

    if meta is not None:
        md = jnp.stack([jnp.asarray(meta.z), jnp.asarray(meta.ebv)], axis=1)
        label = jnp.asarray(meta.target) if meta.target is not None else None
    else:
        md = jnp.zeros((packed.n_objects, 2))
        label = None
    return SequenceBatch(features=features, band=band, times=rel_t, mask=m,
                         meta=md, label=label)
