"""Distributed GBDT on the 8-device CPU mesh == single-device training.

The numeric contract of the distributed design (SURVEY.md §5.8): psum'd
histograms make every device compute identical splits, so the sharded
forest must match the single-device forest."""

import numpy as np
import pytest

from mallorn_tpu.parallel.mesh import make_mesh
from mallorn_tpu.trees.gbdt import GBDTParams, predict_proba, train_gbdt


def test_sharded_matches_single_device():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.sharded_train import train_gbdt_sharded

    rng = np.random.default_rng(0)
    n = 512
    X = rng.normal(size=(n, 10)).astype(np.float32)
    y = ((X[:, 0] - X[:, 1] + rng.normal(0, 0.4, n)) > 0).astype(np.float32)
    X[rng.uniform(size=n) < 0.1, 3] = np.nan

    params = GBDTParams(n_rounds=30, max_depth=4, learning_rate=0.2,
                        subsample=1.0, colsample_bytree=0.8)

    single = train_gbdt(X, y, params)
    mesh = make_mesh(8)
    sharded = train_gbdt_sharded(mesh, X, y, params)

    # identical tree structure
    np.testing.assert_array_equal(np.asarray(single.forest.feature),
                                  np.asarray(sharded.forest.feature))
    np.testing.assert_array_equal(np.asarray(single.forest.split_bin),
                                  np.asarray(sharded.forest.split_bin))
    np.testing.assert_allclose(np.asarray(single.forest.leaf_value),
                               np.asarray(sharded.forest.leaf_value),
                               rtol=2e-4, atol=2e-5)

    p1 = np.asarray(predict_proba(single, X, 30))
    p2 = np.asarray(predict_proba(sharded, X, 30))
    np.testing.assert_allclose(p1, p2, rtol=5e-4, atol=5e-4)


def test_sharded_subsample_matches_single_device():
    """Global-row-id subsampling: identical trees even at subsample<1 —
    the full v92d config (subsample 0.8) trains distributed under the
    identical-trees contract."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.sharded_train import train_gbdt_sharded

    rng = np.random.default_rng(1)
    n = 400
    X = rng.normal(size=(n, 8)).astype(np.float32)
    y = ((X[:, 0] + 0.5 * X[:, 2] + rng.normal(0, 0.4, n)) > 0).astype(np.float32)

    params = GBDTParams(n_rounds=20, max_depth=4, learning_rate=0.2,
                        subsample=0.8, colsample_bytree=0.8)
    single = train_gbdt(X, y, params)
    sharded = train_gbdt_sharded(make_mesh(8), X, y, params)

    np.testing.assert_array_equal(np.asarray(single.forest.feature),
                                  np.asarray(sharded.forest.feature))
    np.testing.assert_array_equal(np.asarray(single.forest.split_bin),
                                  np.asarray(sharded.forest.split_bin))
    np.testing.assert_allclose(np.asarray(single.forest.leaf_value),
                               np.asarray(sharded.forest.leaf_value),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_sharded_folds_match_batched_folds():
    """train_gbdt_folds_sharded (vmapped folds x sharded rows) returns the
    same forests + eval history as the single-device fold vmap."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.sharded_train import train_gbdt_folds_sharded
    from mallorn_tpu.trees.gbdt import train_gbdt_folds

    rng = np.random.default_rng(2)
    n = 300
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = ((X[:, 0] - X[:, 1] + rng.normal(0, 0.5, n)) > 0).astype(np.float32)
    w = (rng.exponential(1.0, n) + 0.2).astype(np.float32)

    folds = []
    for k in range(3):
        va = np.arange(n) % 3 == k
        folds.append({"X": X[~va], "y": y[~va], "w": w[~va],
                      "X_val": X[va], "y_val": y[va], "spw": 2.0})

    params = GBDTParams(n_rounds=15, max_depth=3, learning_rate=0.2,
                        subsample=0.8, colsample_bytree=0.8)
    # shared row padding so both paths use identical shapes/row ids
    pr = ((max(len(f["X"]) for f in folds) + 7) // 8) * 8
    pv = ((max(len(f["X_val"]) for f in folds) + 7) // 8) * 8
    ref = train_gbdt_folds(folds, params, early_stopping_rounds=10,
                           pad_rows_to=pr, pad_val_rows_to=pv)
    got = train_gbdt_folds_sharded(make_mesh(8), folds, params,
                                   early_stopping_rounds=10,
                                   pad_rows_to=pr, pad_val_rows_to=pv)
    assert len(ref) == len(got)
    for m_ref, m_got in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(m_ref.forest.feature),
                                      np.asarray(m_got.forest.feature))
        np.testing.assert_array_equal(np.asarray(m_ref.forest.split_bin),
                                      np.asarray(m_got.forest.split_bin))
        np.testing.assert_allclose(np.asarray(m_ref.forest.leaf_value),
                                   np.asarray(m_got.forest.leaf_value),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(m_ref.eval_history),
                                   np.asarray(m_got.eval_history),
                                   rtol=1e-4, atol=1e-5)
        assert m_ref.best_iteration == m_got.best_iteration


def test_row_quantum_keeps_binlane_kernel_viable():
    """Regression for the round-3 sharded slowdown: TPU row padding must
    leave every shard's row count tileable by the bin-lane histogram
    kernel (_pick_row_chunk >= 256), or the fit silently drops to the
    ~2.5x-slower per-level one-hot path (PERF.md, sharded section)."""
    from mallorn_tpu.parallel.sharded_train import _row_quantum
    from mallorn_tpu.trees.gbdt import _pick_row_chunk

    assert _row_quantum(1, backend="tpu") == 512
    assert _row_quantum(8, backend="tpu") == 4096
    assert _row_quantum(3, backend="tpu") == 1536
    # CPU meshes keep the natural quantum so identical-trees tests can
    # compare unpadded against the single-device reference
    assert _row_quantum(8, backend="cpu") == 8

    for n_dev in (1, 2, 4, 8):
        q = _row_quantum(n_dev, backend="tpu")
        for n in (600, 2464, 8142, 10178, 16384):
            padded = ((n + q - 1) // q) * q
            per_shard = padded // n_dev
            assert per_shard % 512 == 0
            assert _pick_row_chunk(per_shard, cap=2048) >= 256, (n_dev, n)


def test_sharded_folds_multiclass_match_single_device():
    """Distributed multiclass (v62 multi:softprob) training builds the
    SAME class-stacked forests as the single-device fold vmap — the
    identical-trees contract extends to K-class fits (per-class
    histograms psum'd; best_mv carries [K, n_val] margins whose sharded
    axis is the LAST one)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.sharded_train import train_gbdt_folds_sharded
    from mallorn_tpu.trees.gbdt import train_gbdt_folds

    rng = np.random.default_rng(5)
    n, K = 240, 3
    X = rng.normal(size=(n, 6)).astype(np.float32)
    W = rng.normal(size=(6, K))
    y = np.argmax(X @ W + rng.normal(0, 0.4, (n, K)), axis=1).astype(np.float32)

    folds = []
    for k in range(3):
        va = np.arange(n) % 3 == k
        folds.append({"X": X[~va], "y": y[~va],
                      "X_val": X[va], "y_val": y[va], "spw": 1.0})

    params = GBDTParams(n_rounds=10, max_depth=3, learning_rate=0.2,
                        subsample=0.8, colsample_bytree=0.8, num_class=K)
    pr = ((max(len(f["X"]) for f in folds) + 7) // 8) * 8
    pv = ((max(len(f["X_val"]) for f in folds) + 7) // 8) * 8
    ref = train_gbdt_folds(folds, params, early_stopping_rounds=5,
                           pad_rows_to=pr, pad_val_rows_to=pv)
    got = train_gbdt_folds_sharded(make_mesh(8), folds, params,
                                   early_stopping_rounds=5,
                                   pad_rows_to=pr, pad_val_rows_to=pv)
    for m_ref, m_got in zip(ref, got):
        assert m_ref.forest.feature.ndim == 3  # [R, K, I] class-stacked
        np.testing.assert_array_equal(np.asarray(m_ref.forest.feature),
                                      np.asarray(m_got.forest.feature))
        np.testing.assert_array_equal(np.asarray(m_ref.forest.split_bin),
                                      np.asarray(m_got.forest.split_bin))
        np.testing.assert_allclose(np.asarray(m_ref.forest.leaf_value),
                                   np.asarray(m_got.forest.leaf_value),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(m_ref.eval_history),
                                   np.asarray(m_got.eval_history),
                                   rtol=1e-4, atol=1e-5)
        assert m_ref.best_iteration == m_got.best_iteration
        if m_ref.val_margin is not None and m_got.val_margin is not None:
            np.testing.assert_allclose(m_ref.val_margin, m_got.val_margin,
                                       rtol=1e-4, atol=1e-5)


def test_comm_volume_inventory():
    """HLO-measured collective inventory (PERF.md comm-volume account):
    the ONLY data crossing ICI per boosting round are the per-level
    histogram all-reduces f32[F, 2^d, n_bins+1, 2] (+ sub-KB root
    reductions); rows never reshard (no all-gather/all-to-all)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.sharded_train import comm_volume_report

    F, depth, n_bins = 32, 4, 256
    params = GBDTParams(n_rounds=10, max_depth=depth, learning_rate=0.2,
                        n_bins=n_bins)
    mesh = make_mesh(8)
    rep = comm_volume_report(mesh, n_rows=512, n_features=F, params=params)

    assert not rep["rows_resharded"], rep["collectives"]
    big = [(k, s, b) for k, s, b in rep["collectives"] if b > 1024]
    # exactly one histogram all-reduce per tree level
    expected = {f"f32[{F},{2 ** d},{n_bins + 1},2]" for d in range(depth)}
    assert {s for _, s, _ in big} == expected, big
    assert all(k == "all-reduce" for k, _, _ in big)

    # analytic account matches the measured shapes
    analytic = sum(F * (2 ** d) * (n_bins + 1) * 2 * 4 for d in range(depth))
    small = sum(b for _, _, b in rep["collectives"]) - sum(b for *_, b in big)
    assert rep["psum_bytes_per_round"] == analytic + small
    assert small < 4096, rep["collectives"]


def test_multislice_2d_mesh_matches_single_device():
    """Multi-slice readiness: rows sharded over a 2-axis (dcn x obj) mesh
    (make_mesh_2d), the histogram psum spanning BOTH axes — identical
    trees to single-device, same contract as the 1-D mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.mesh import DCN_AXIS, OBJ_AXIS, make_mesh_2d
    from mallorn_tpu.parallel.sharded_train import train_gbdt_sharded

    rng = np.random.default_rng(5)
    n = 512
    X = rng.normal(size=(n, 10)).astype(np.float32)
    y = ((X[:, 0] - X[:, 1] + rng.normal(0, 0.4, n)) > 0).astype(np.float32)
    X[rng.uniform(size=n) < 0.1, 3] = np.nan

    params = GBDTParams(n_rounds=20, max_depth=4, learning_rate=0.2,
                        subsample=0.8, colsample_bytree=0.8)
    single = train_gbdt(X, y, params)
    mesh2d = make_mesh_2d(2, 4)
    sharded = train_gbdt_sharded(mesh2d, X, y, params,
                                 axis=(DCN_AXIS, OBJ_AXIS))

    np.testing.assert_array_equal(np.asarray(single.forest.feature),
                                  np.asarray(sharded.forest.feature))
    np.testing.assert_array_equal(np.asarray(single.forest.split_bin),
                                  np.asarray(sharded.forest.split_bin))
    np.testing.assert_allclose(np.asarray(single.forest.leaf_value),
                               np.asarray(sharded.forest.leaf_value),
                               rtol=2e-4, atol=2e-5)


def test_multislice_comm_inventory():
    """The 2-axis mesh emits the same single histogram all-reduce per
    level (now spanning all 8 devices across both axes) and still no
    all-gather/all-to-all."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.mesh import DCN_AXIS, OBJ_AXIS, make_mesh_2d
    from mallorn_tpu.parallel.sharded_train import comm_volume_report

    F, depth, n_bins = 32, 4, 256
    params = GBDTParams(n_rounds=10, max_depth=depth, learning_rate=0.2,
                        n_bins=n_bins)
    rep = comm_volume_report(make_mesh_2d(2, 4), n_rows=512, n_features=F,
                             params=params, axis=(DCN_AXIS, OBJ_AXIS))
    assert not rep["rows_resharded"], rep["collectives"]
    big = [(k, s, b) for k, s, b in rep["collectives"] if b > 1024]
    expected = {f"f32[{F},{2 ** d},{n_bins + 1},2]" for d in range(depth)}
    assert {s for _, s, _ in big} == expected, big
    assert all(k == "all-reduce" for k, _, _ in big)
