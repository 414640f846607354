"""Pallas TPU kernel: per-(feature, node, bin) gradient histograms.

The GBDT's hot op (SURVEY.md §2.1: XGBoost's C++ hist builder is exactly
the component that becomes a TPU kernel). The XLA path lowers the vmapped
``segment_sum`` to scatter-adds; this kernel instead rides the MXU: for a
block of rows and one feature, build a one-hot indicator
``[n_segments, rows]`` from a broadcasted iota comparison and contract it
against the [rows, 2] (grad, hess) matrix — histogramming as matmul.

Grid: (features, row-chunks). The output block for a feature is revisited
across row-chunks and accumulated in place (initialized at chunk 0).

Used when the row count makes scatter the bottleneck; the trainer falls
back to segment_sum for small problems and on CPU (where Pallas runs
interpreted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


F_BLOCK = 8  # feature block (TPU sublane constraint on the block spec)


def _hist_kernel(seg_ref, gh_ref, out_ref, *, n_seg: int, rows: int):
    """One (feature-block, row-chunk) program.

    seg_ref: [F_BLOCK, R] int32 segment ids
             (node * n_bins_tot + bin; >= n_seg means 'inactive row')
    gh_ref:  [R, 2] f32 (grad, hess)
    out_ref: [F_BLOCK, n_seg, 2] f32 accumulated histograms
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (n_seg, rows), 0)
    gh = gh_ref[:, :]
    for k in range(F_BLOCK):  # one [S, R] onehot in VMEM at a time
        seg = seg_ref[k, :]
        onehot = (seg[None, :] == seg_ids).astype(jnp.float32)  # [S, R]
        out_ref[k, :, :] += jnp.dot(onehot, gh,
                                    preferred_element_type=jnp.float32)


def build_histograms_pallas(
    seg: jnp.ndarray,  # [F, N] int32 per-feature segment ids
    gh: jnp.ndarray,  # [N, 2] f32 (grad, hess)
    n_seg: int,
    row_chunk: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [F, n_seg, 2] f32 histograms."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    f, n = seg.shape
    f_pad = _round_up(f, F_BLOCK)
    n_pad = _round_up(n, row_chunk)
    s_pad = _round_up(n_seg, 8)
    if n_pad != n:
        # padded rows get an out-of-range segment id -> contribute nowhere
        seg = jnp.concatenate(
            [seg, jnp.full((f, n_pad - n), s_pad, jnp.int32)], axis=1)
        gh = jnp.concatenate([gh, jnp.zeros((n_pad - n, 2), gh.dtype)], axis=0)
    if f_pad != f:
        seg = jnp.concatenate(
            [seg, jnp.full((f_pad - f, n_pad), s_pad, jnp.int32)], axis=0)
    # out-of-range ids (inactive rows) match no iota row
    seg = jnp.where(seg >= n_seg, s_pad, seg)

    grid = (f_pad // F_BLOCK, n_pad // row_chunk)
    kernel = functools.partial(_hist_kernel, n_seg=s_pad, rows=row_chunk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((F_BLOCK, row_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((row_chunk, 2), lambda i, j: (j, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F_BLOCK, s_pad, 2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, s_pad, 2), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seg, gh)
    return out[:f, :n_seg, :]
