"""Ragged lightcurves -> dense padded device arrays.

The reference pipeline iterates per object / per band over pandas groups
(reference: src/features/statistical.py:159-183, bazin_fitting.py:276-288).
Here the whole dataset becomes two dense padded tensors:

- per-band view  ``[N, 6, T]``  (time-sorted within each band), and
- all-band view  ``[N, TA]``    (time-sorted across bands, with band ids),

each with a validity mask, so every feature kernel is a masked vmapped
computation over the object axis — the TPU batch axis.

Padding conventions (load-bearing for downstream kernels):
- time     -> TIME_PAD (1e9) so a time-sort keeps real points in front
- flux     -> 0.0
- flux_err -> 1.0 (never 0, so divisions are safe; masked out anyway)
- band id  -> -1
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from mallorn_tpu.utils.constants import N_BANDS, TIME_PAD


class PackedLightcurves(NamedTuple):
    """Dense padded views of a ragged multi-band lightcurve dataset.

    All arrays are device-ready; a NamedTuple so the whole structure is a
    JAX pytree (shards over the leading object axis with `shard_map`).
    """

    # Per-band view, time-sorted within each (object, band): [N, 6, T]
    band_time: jnp.ndarray
    band_flux: jnp.ndarray
    band_err: jnp.ndarray
    band_mask: jnp.ndarray  # bool

    # All-band view, time-sorted per object: [N, TA]
    all_time: jnp.ndarray
    all_flux: jnp.ndarray
    all_err: jnp.ndarray
    all_band: jnp.ndarray  # int32, -1 for padding
    all_mask: jnp.ndarray  # bool

    # Global offset subtracted from all stored times. Times are kept small
    # (days since dataset start) so float32 keeps sub-minute dt precision;
    # features reporting absolute epochs (peak_mjd, bazin_t0) add it back.
    time_offset: float = 0.0

    @property
    def n_objects(self) -> int:
        return self.band_time.shape[0]


@dataclasses.dataclass
class Metadata:
    """Host-side per-object metadata aligned with PackedLightcurves rows."""

    object_ids: np.ndarray  # [N] str
    z: np.ndarray  # [N] f32 redshift
    ebv: np.ndarray  # [N] f32 extinction
    target: Optional[np.ndarray] = None  # [N] int, None for test sets
    spec_type: Optional[np.ndarray] = None  # [N] str


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def pack_lightcurves(
    object_index: np.ndarray,
    time: np.ndarray,
    flux: np.ndarray,
    flux_err: np.ndarray,
    band: np.ndarray,
    n_objects: int,
    pad_multiple: int = 8,
    max_band_len: Optional[int] = None,
    max_total_len: Optional[int] = None,
) -> PackedLightcurves:
    """Pack flat observation arrays into dense padded tensors.

    Args:
        object_index: [M] int, row index of each observation's object.
        time/flux/flux_err: [M] float observation columns.
        band: [M] int band index in LSST order (u..y = 0..5).
        n_objects: number of objects N (rows of the packed tensors).
        pad_multiple: round padded lengths up to this multiple (TPU sublanes).
        max_band_len / max_total_len: optional fixed lengths (for cross-split
            consistency); observations beyond them are dropped (rare tail).

    Vectorized host-side packing: a single lexsort + bincount, no Python
    loop over objects.
    """
    object_index = np.asarray(object_index, dtype=np.int64)
    time = np.asarray(time, dtype=np.float64)
    time_offset = float(np.floor(time.min())) if len(time) else 0.0
    time = time - time_offset
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    band = np.asarray(band, dtype=np.int64)

    m = len(time)
    if not (len(flux) == len(flux_err) == len(band) == len(object_index) == m):
        raise ValueError("all observation columns must have equal length")

    # ---- per-band view ------------------------------------------------
    group = object_index * N_BANDS + band  # [M]
    order = np.lexsort((time, group))
    g_sorted = group[order]
    counts = np.bincount(g_sorted, minlength=n_objects * N_BANDS)
    # position of each row within its (object, band) group
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(m) - np.repeat(starts[counts > 0], counts[counts > 0])

    t_band = int(counts.max()) if m else 1
    if max_band_len is not None:
        t_band = min(t_band, max_band_len)
    t_band = _round_up(t_band, pad_multiple)

    keep = pos < t_band
    bt = np.full((n_objects * N_BANDS, t_band), TIME_PAD, dtype=np.float32)
    bf = np.zeros((n_objects * N_BANDS, t_band), dtype=np.float32)
    be = np.ones((n_objects * N_BANDS, t_band), dtype=np.float32)
    bm = np.zeros((n_objects * N_BANDS, t_band), dtype=bool)
    rows = g_sorted[keep]
    cols = pos[keep]
    bt[rows, cols] = time[order][keep]
    bf[rows, cols] = flux[order][keep]
    be[rows, cols] = flux_err[order][keep]
    bm[rows, cols] = True

    # ---- all-band view ------------------------------------------------
    order_a = np.lexsort((time, object_index))
    o_sorted = object_index[order_a]
    counts_a = np.bincount(o_sorted, minlength=n_objects)
    starts_a = np.concatenate([[0], np.cumsum(counts_a)[:-1]])
    pos_a = np.arange(m) - np.repeat(starts_a[counts_a > 0], counts_a[counts_a > 0])

    t_all = int(counts_a.max()) if m else 1
    if max_total_len is not None:
        t_all = min(t_all, max_total_len)
    t_all = _round_up(t_all, pad_multiple)

    keep_a = pos_a < t_all
    at = np.full((n_objects, t_all), TIME_PAD, dtype=np.float32)
    af = np.zeros((n_objects, t_all), dtype=np.float32)
    ae = np.ones((n_objects, t_all), dtype=np.float32)
    ab = np.full((n_objects, t_all), -1, dtype=np.int32)
    am = np.zeros((n_objects, t_all), dtype=bool)
    rows_a = o_sorted[keep_a]
    cols_a = pos_a[keep_a]
    at[rows_a, cols_a] = time[order_a][keep_a]
    af[rows_a, cols_a] = flux[order_a][keep_a]
    ae[rows_a, cols_a] = flux_err[order_a][keep_a]
    ab[rows_a, cols_a] = band[order_a][keep_a]
    am[rows_a, cols_a] = True

    return PackedLightcurves(
        band_time=jnp.asarray(bt.reshape(n_objects, N_BANDS, t_band)),
        band_flux=jnp.asarray(bf.reshape(n_objects, N_BANDS, t_band)),
        band_err=jnp.asarray(be.reshape(n_objects, N_BANDS, t_band)),
        band_mask=jnp.asarray(bm.reshape(n_objects, N_BANDS, t_band)),
        all_time=jnp.asarray(at),
        all_flux=jnp.asarray(af),
        all_err=jnp.asarray(ae),
        all_band=jnp.asarray(ab),
        all_mask=jnp.asarray(am),
        time_offset=time_offset,
    )


def unify_time_padding(*packs: PackedLightcurves):
    """Re-pad the time axes of several packed sets to shared lengths so
    feature-extraction kernels compile once across splits."""
    t_band = max(p.band_time.shape[-1] for p in packs)
    t_all = max(p.all_time.shape[-1] for p in packs)

    def pad_last(x, n, fill):
        extra = n - x.shape[-1]
        if extra <= 0:
            return x
        pad_width = [(0, 0)] * (x.ndim - 1) + [(0, extra)]
        return jnp.pad(x, pad_width, constant_values=fill)

    out = []
    for p in packs:
        out.append(PackedLightcurves(
            band_time=pad_last(p.band_time, t_band, TIME_PAD),
            band_flux=pad_last(p.band_flux, t_band, 0.0),
            band_err=pad_last(p.band_err, t_band, 1.0),
            band_mask=pad_last(p.band_mask, t_band, False),
            all_time=pad_last(p.all_time, t_all, TIME_PAD),
            all_flux=pad_last(p.all_flux, t_all, 0.0),
            all_err=pad_last(p.all_err, t_all, 1.0),
            all_band=pad_last(p.all_band, t_all, -1),
            all_mask=pad_last(p.all_mask, t_all, False),
            time_offset=p.time_offset,
        ))
    return tuple(out)


def pad_objects(packed: PackedLightcurves, n_total: int) -> PackedLightcurves:
    """Pad the object axis up to ``n_total`` rows (for even device sharding)."""
    n = packed.n_objects
    if n_total < n:
        raise ValueError(f"cannot shrink from {n} to {n_total}")
    if n_total == n:
        return packed
    extra = n_total - n

    def _pad(x, fill):
        pad_shape = (extra,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(pad_shape, fill, dtype=x.dtype)], axis=0)

    return PackedLightcurves(
        band_time=_pad(packed.band_time, TIME_PAD),
        band_flux=_pad(packed.band_flux, 0.0),
        band_err=_pad(packed.band_err, 1.0),
        band_mask=_pad(packed.band_mask, False),
        all_time=_pad(packed.all_time, TIME_PAD),
        all_flux=_pad(packed.all_flux, 0.0),
        all_err=_pad(packed.all_err, 1.0),
        all_band=_pad(packed.all_band, -1),
        all_mask=_pad(packed.all_mask, False),
        time_offset=packed.time_offset,
    )
