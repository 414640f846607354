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


# Feature block per program. The kernel is grid-step-overhead-bound
# (PERF.md: ~6 us/program fixed cost vs ~30 us of MXU work), so fatter
# programs — more features per program, bigger row chunks — cut the
# per-round histogram latency near-linearly until VMEM bounds bite.
F_BLOCK = 32


S_LO = 128  # lane width: the low digit of the segment-id decomposition


def _hist_kernel(seg_ref, gh_ref, out_ref, *, n_hi: int, rows: int):
    """One (feature-block, row-chunk) program.

    seg_ref: [F_BLOCK, R] int32 segment ids
             (node * n_bins_tot + bin; >= n_hi*128 means 'inactive row')
    gh_ref:  [R, 2] f32 (grad, hess)
    out_ref: [F_BLOCK, 2, n_hi, S_LO] f32 accumulated histograms.

    Digit decomposition seg = hi*128 + lo: the histogram factorizes as
    hist[hi, lo] = sum_r v_r * A[r, hi] * B[r, lo] = (A ⊙ v)^T @ B with
    0/1 factors A [R, n_hi], B [R, 128] — a matmul with N = 128 lanes at
    FULL MXU utilization, instead of a [S, R] @ [R, 2] contraction that
    uses 2/128 output lanes and needs the full one-hot (VPU-bound)
    materialized. The A/B/product intermediates all live in VMEM (the
    pure-XLA version of this decomposition was HBM-traffic-bound on the
    [F, N, n_hi*2] intermediate — PERF.md round 1).

    HIGHEST matmul precision: the default bf16-multiply path rounds the
    grad/hess inputs to ~3 digits, which measurably perturbs split gains
    vs the segment_sum oracle (caught by the on-device check in bench.py).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :, :, :] = jnp.zeros_like(out_ref)

    hi_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, n_hi), 1)
    lo_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, S_LO), 1)
    g = gh_ref[:, 0]
    h = gh_ref[:, 1]
    dn = (((0,), (0,)), ((), ()))  # contract over rows: A^T @ B
    for k in range(F_BLOCK):
        seg = seg_ref[k, :]
        hi = seg // S_LO
        lo = seg - hi * S_LO
        A = (hi[:, None] == hi_ids).astype(jnp.float32)  # [R, n_hi]
        B = (lo[:, None] == lo_ids).astype(jnp.float32)  # [R, 128]
        out_ref[k, 0, :, :] += jax.lax.dot_general(
            A * g[:, None], B, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[k, 1, :, :] += jax.lax.dot_general(
            A * h[:, None], B, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def build_histograms_pallas(
    seg: jnp.ndarray,  # [F, N] int32 per-feature segment ids
    gh: jnp.ndarray,  # [N, 2] f32 (grad, hess)
    n_seg: int,
    row_chunk: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [F, n_seg, 2] f32 histograms."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    f, n = seg.shape
    f_pad = _round_up(f, F_BLOCK)
    n_pad = _round_up(n, row_chunk)
    s_pad = _round_up(n_seg, S_LO)
    n_hi = s_pad // S_LO
    if n_pad != n:
        # padded rows get an out-of-range segment id -> contribute nowhere
        seg = jnp.concatenate(
            [seg, jnp.full((f, n_pad - n), s_pad, jnp.int32)], axis=1)
        gh = jnp.concatenate([gh, jnp.zeros((n_pad - n, 2), gh.dtype)], axis=0)
    if f_pad != f:
        seg = jnp.concatenate(
            [seg, jnp.full((f_pad - f, n_pad), s_pad, jnp.int32)], axis=0)
    # out-of-range ids (inactive rows): hi digit == n_hi matches no column
    seg = jnp.where(seg >= n_seg, s_pad, seg)

    grid = (f_pad // F_BLOCK, n_pad // row_chunk)
    kernel = functools.partial(_hist_kernel, n_hi=n_hi, rows=row_chunk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((F_BLOCK, row_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((row_chunk, 2), lambda i, j: (j, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F_BLOCK, 2, n_hi, S_LO),
                               lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, 2, n_hi, S_LO), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seg, gh)
    out = out.reshape(f_pad, 2, s_pad)
    return jnp.swapaxes(out, 1, 2)[:f, :n_seg, :]
