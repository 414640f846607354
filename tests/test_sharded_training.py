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
