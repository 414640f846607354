"""Pallas histogram kernel vs segment_sum reference (interpreted on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.ops.hist_pallas import build_histograms_pallas


def test_matches_segment_sum():
    rng = np.random.default_rng(0)
    n, f, n_seg = 700, 5, 4 * 65  # 4 nodes x 65 bins
    seg = rng.integers(0, n_seg + 10, size=(f, n)).astype(np.int32)  # some inactive
    gh = rng.normal(size=(n, 2)).astype(np.float32)

    got = np.asarray(build_histograms_pallas(
        jnp.asarray(seg), jnp.asarray(gh), n_seg, row_chunk=256, interpret=True))

    want = np.zeros((f, n_seg, 2), np.float32)
    for fi in range(f):
        for i in range(n):
            s = seg[fi, i]
            if s < n_seg:
                want[fi, s] += gh[i]

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_row_padding_is_inert():
    rng = np.random.default_rng(1)
    n, f, n_seg = 130, 3, 16  # n not a multiple of the chunk
    seg = rng.integers(0, n_seg, size=(f, n)).astype(np.int32)
    gh = rng.normal(size=(n, 2)).astype(np.float32)
    got = np.asarray(build_histograms_pallas(
        jnp.asarray(seg), jnp.asarray(gh), n_seg, row_chunk=128, interpret=True))
    want = np.zeros((f, n_seg, 2), np.float32)
    for fi in range(f):
        np.add.at(want[fi], seg[fi], gh)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
