"""Pallas histogram kernel vs segment_sum reference (interpreted on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.ops.hist_pallas import (
    build_histograms_binlane,
    build_histograms_pallas,
    precompute_binlane,
    split_gh_digits,
)


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


def test_binlane_matches_oracle():
    """Bin-lane streamed kernel (bf16x3 digits) vs dense NumPy oracle."""
    rng = np.random.default_rng(2)
    f, n, nbt = 5, 384, 257
    for n_nodes in (1, 4):
        binned = rng.integers(0, nbt, (f, n), dtype=np.int32)
        node_q = rng.integers(0, n_nodes + 1, n, dtype=np.int32)
        g = rng.normal(size=n).astype(np.float32) * 3.7
        h = np.abs(rng.normal(size=n)).astype(np.float32)

        bhot, hib = precompute_binlane(jnp.asarray(binned))
        gd = split_gh_digits(jnp.asarray(g), jnp.asarray(h))
        got = np.asarray(build_histograms_binlane(
            bhot, hib, jnp.asarray(node_q), gd, n_nodes, nbt,
            row_chunk=128, interpret=True))

        want = np.zeros((f, n_nodes, nbt, 2), np.float64)
        for fi in range(f):
            for r in range(n):
                if node_q[r] < n_nodes:
                    want[fi, node_q[r], binned[fi, r], 0] += g[r]
                    want[fi, node_q[r], binned[fi, r], 1] += h[r]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_binlane_training_parity():
    """train_gbdt with the bin-lane kernel builds the same trees as the
    segment_sum path (forced on CPU; interpret-mode Pallas)."""
    from mallorn_tpu.trees.gbdt import GBDTParams, train_gbdt

    rng = np.random.default_rng(3)
    n, f = 256, 12
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 1] ** 2 + 0.3 * rng.normal(size=n) > 0.4)
    X[rng.random((n, f)) < 0.1] = np.nan

    base = GBDTParams(n_rounds=12, max_depth=3, learning_rate=0.3,
                      subsample=1.0, colsample_bytree=1.0)
    m_ref = train_gbdt(X, y.astype(np.float32),
                       base._replace(use_binlane_hist=False))
    m_bl = train_gbdt(X, y.astype(np.float32),
                      base._replace(use_binlane_hist=True))
    np.testing.assert_array_equal(np.asarray(m_ref.forest.feature),
                                  np.asarray(m_bl.forest.feature))
    np.testing.assert_array_equal(np.asarray(m_ref.forest.split_bin),
                                  np.asarray(m_bl.forest.split_bin))
    np.testing.assert_allclose(np.asarray(m_ref.forest.leaf_value),
                               np.asarray(m_bl.forest.leaf_value),
                               rtol=2e-4, atol=2e-5)


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


def test_binlane_i8_matches_segment_sum_interpret():
    """int8 fixed-point bin-lane kernel vs segment_sum (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from mallorn_tpu.ops.hist_pallas import (build_histograms_binlane_i8,
                                             precompute_binlane_i8,
                                             quantize_gh_i8)

    rng = np.random.default_rng(7)
    f, n, n_nodes, nbt = 5, 640, 4, 257
    binned = jnp.asarray(rng.integers(0, nbt, size=(f, n)), jnp.int32)
    node_q = jnp.asarray(rng.integers(0, n_nodes + 1, size=n), jnp.int32)
    g = jnp.asarray(rng.normal(size=n) * 2.0, jnp.float32)
    h = jnp.abs(g) * 0.3 + 0.01

    bhot, hib = precompute_binlane_i8(binned)
    gd, s_g, s_h = quantize_gh_i8(g, h)
    got = np.asarray(build_histograms_binlane_i8(
        bhot, hib, node_q, gd, s_g, s_h, n_nodes, nbt, row_chunk=256,
        interpret=True))

    seg = jnp.where(node_q < n_nodes, node_q * nbt + binned, n_nodes * nbt)
    want = np.stack([np.asarray(jax.ops.segment_sum(
        jnp.stack([g, h], -1), s, num_segments=n_nodes * nbt + 1)[:-1])
        for s in np.asarray(seg)]).reshape(f, n_nodes, nbt, 2)
    # fixed-point: error <= n * max|x| * 2^-27 per cell
    atol = float(n * max(np.max(np.abs(g)), np.max(np.abs(h))) / 2 ** 27) * 4
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=max(atol, 1e-4))


def test_quantize_gh_i8_roundtrip():
    from mallorn_tpu.ops.hist_pallas import quantize_gh_i8

    rng = np.random.default_rng(1)
    g = rng.normal(size=1000).astype(np.float32) * 3
    h = np.abs(rng.normal(size=1000)).astype(np.float32) * 0.1
    gd, s_g, s_h = quantize_gh_i8(np.asarray(g), np.asarray(h))
    gd = np.asarray(gd, np.int64)
    w = np.array([1, 128, 128 ** 2, 128 ** 3], np.int64)
    g_rec = (gd[:, 0:4] @ w) * float(s_g) / 2 ** 26
    h_rec = (gd[:, 4:8] @ w) * float(s_h) / 2 ** 26
    np.testing.assert_allclose(g_rec, g, atol=float(s_g) / 2 ** 26)
    np.testing.assert_allclose(h_rec, h, atol=float(s_h) / 2 ** 26)
    assert np.abs(gd).max() <= 64


def test_route_dynslice_equals_onehot():
    """Level routing via per-node dynamic slices must build the exact
    trees the [N, F] one-hot routing builds (identical forests)."""
    import jax

    from mallorn_tpu.trees.gbdt import GBDTParams, train_gbdt

    rng = np.random.default_rng(3)
    X = rng.normal(size=(500, 23)).astype(np.float32)
    X[rng.uniform(size=X.shape) < 0.1] = np.nan
    y = ((np.nan_to_num(X[:, 0]) + np.nan_to_num(X[:, 3]) > 0.3)
         ).astype(np.float32)
    for policy in ("depthwise", "symmetric"):
        p = GBDTParams(n_rounds=12, max_depth=4, subsample=0.8,
                       grow_policy=policy)
        m_dyn = train_gbdt(X, y, p._replace(route="dynslice"))
        m_one = train_gbdt(X, y, p._replace(route="onehot"))
        for a, b in zip(m_dyn.forest, m_one.forest):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_binlane_i8bf16_matches_bf16_interpret():
    """int8-streamed one-hot + bf16 kernel == bf16 one-hot exactly."""
    import jax.numpy as jnp

    from mallorn_tpu.ops.hist_pallas import (build_histograms_binlane,
                                             precompute_binlane,
                                             precompute_binlane_i8,
                                             split_gh_digits)

    rng = np.random.default_rng(9)
    f, n, n_nodes, nbt = 3, 512, 2, 257
    binned = jnp.asarray(rng.integers(0, nbt, size=(f, n)), jnp.int32)
    node_q = jnp.asarray(rng.integers(0, n_nodes + 1, size=n), jnp.int32)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    gd = split_gh_digits(g, jnp.abs(g) + 0.1)

    b16, hib = precompute_binlane(binned)
    b8, hib8 = precompute_binlane_i8(binned)
    np.testing.assert_array_equal(np.asarray(hib), np.asarray(hib8))
    a = build_histograms_binlane(b16, hib, node_q, gd, n_nodes, nbt,
                                 row_chunk=256, interpret=True)
    b = build_histograms_binlane(b8, hib8, node_q, gd, n_nodes, nbt,
                                 row_chunk=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hist_subtraction_training_parity():
    """hist_subtract (parent-minus-sibling right-child histograms) builds
    the same trees as direct per-level histograms, including with row
    subsampling and early leaves (forced binlane on CPU; interpret)."""
    from mallorn_tpu.trees.gbdt import GBDTParams, train_gbdt

    rng = np.random.default_rng(7)
    n, f = 384, 10
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (X[:, 0] - 0.4 * X[:, 2] + 0.3 * rng.normal(size=n) > 0.1)
    X[rng.random((n, f)) < 0.15] = np.nan

    base = GBDTParams(n_rounds=10, max_depth=4, learning_rate=0.3,
                      subsample=0.7, colsample_bytree=1.0,
                      use_binlane_hist=True)
    m_dir = train_gbdt(X, y.astype(np.float32),
                       base._replace(hist_subtract=False))
    m_sub = train_gbdt(X, y.astype(np.float32),
                       base._replace(hist_subtract=True))
    np.testing.assert_array_equal(np.asarray(m_dir.forest.feature),
                                  np.asarray(m_sub.forest.feature))
    np.testing.assert_array_equal(np.asarray(m_dir.forest.split_bin),
                                  np.asarray(m_sub.forest.split_bin))
    np.testing.assert_array_equal(np.asarray(m_dir.forest.is_leaf),
                                  np.asarray(m_sub.forest.is_leaf))
    np.testing.assert_allclose(np.asarray(m_dir.forest.leaf_value),
                               np.asarray(m_sub.forest.leaf_value),
                               rtol=2e-4, atol=2e-5)


def test_hist_subtraction_symmetric_parity():
    """Subtraction under CatBoost oblivious growth (shared level split)."""
    from mallorn_tpu.trees.gbdt import GBDTParams, train_gbdt

    rng = np.random.default_rng(11)
    n, f = 256, 8  # n must have a x128 divisor >= 256 or binlane disables
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (0.8 * X[:, 1] + 0.2 * rng.normal(size=n) > 0.0)

    base = GBDTParams(n_rounds=8, max_depth=4, learning_rate=0.3,
                      subsample=1.0, colsample_bytree=1.0,
                      grow_policy="symmetric", use_binlane_hist=True)
    m_dir = train_gbdt(X, y.astype(np.float32),
                       base._replace(hist_subtract=False))
    m_sub = train_gbdt(X, y.astype(np.float32),
                       base._replace(hist_subtract=True))
    np.testing.assert_array_equal(np.asarray(m_dir.forest.feature),
                                  np.asarray(m_sub.forest.feature))
    np.testing.assert_array_equal(np.asarray(m_dir.forest.split_bin),
                                  np.asarray(m_sub.forest.split_bin))


def test_fullhot_matches_binlane_interpret():
    """The full-bin one-hot kernel ("i8full") must equal the 128-lane
    binlane kernel cell for cell — same digit recombination, the node
    matrix just moves out of the per-feature loop."""
    from mallorn_tpu.ops import hist_pallas as hp

    rng = np.random.default_rng(5)
    F, N, NBT = 37, 500, 257
    binned = jnp.asarray(rng.integers(0, NBT, size=(F, N)), jnp.int32)
    g = jnp.asarray(rng.normal(size=N), jnp.float32)
    h = jnp.abs(g) * 0.25 + 0.01
    gd = hp.split_gh_digits(g, h)
    bh_i8, hib = hp.precompute_binlane_i8(binned)
    fh = hp.precompute_fullhot_i8(binned, NBT)
    for n_nodes in (1, 2, 8):
        node_q = jnp.asarray(rng.integers(0, n_nodes + 1, size=N), jnp.int32)
        want = np.asarray(hp.build_histograms_binlane(
            bh_i8, hib, node_q, gd, n_nodes, NBT, row_chunk=256))
        got = np.asarray(hp.build_histograms_fullhot(
            fh, node_q, gd, n_nodes, NBT, row_chunk=256))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fullhot_training_parity():
    """hist_dtype='i8full' end-to-end fit builds identical forests to the
    shipped i8bf16 path (NaN bins, subsample, colsample active)."""
    from mallorn_tpu.trees.gbdt import GBDTParams, train_gbdt

    rng = np.random.default_rng(7)
    n, f = 384, 12
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (0.7 * X[:, 2] - 0.4 * X[:, 5] + 0.4 * rng.normal(size=n) > 0.0)
    X[rng.random((n, f)) < 0.15] = np.nan

    base = GBDTParams(n_rounds=10, max_depth=4, learning_rate=0.3,
                      subsample=0.7, colsample_bytree=0.8,
                      use_binlane_hist=True)
    m_ref = train_gbdt(X, y.astype(np.float32),
                       base._replace(hist_dtype="i8bf16"))
    m_fh = train_gbdt(X, y.astype(np.float32),
                      base._replace(hist_dtype="i8full"))
    np.testing.assert_array_equal(np.asarray(m_ref.forest.feature),
                                  np.asarray(m_fh.forest.feature))
    np.testing.assert_array_equal(np.asarray(m_ref.forest.split_bin),
                                  np.asarray(m_fh.forest.split_bin))
    np.testing.assert_allclose(np.asarray(m_ref.forest.leaf_value),
                               np.asarray(m_fh.forest.leaf_value),
                               rtol=2e-4, atol=2e-5)
