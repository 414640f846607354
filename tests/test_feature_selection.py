"""Feature selection: matmul pairwise-complete correlation vs pandas,
and the prune/rank behavior (reference: scripts/feature_selection.py)."""

import numpy as np
import pandas as pd

from mallorn_tpu.train.feature_selection import (
    _pairwise_complete_corr, correlation_prune, select_features)


def test_pairwise_complete_corr_matches_pandas():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 50)) * rng.lognormal(0, 3, 50)
    X[rng.random((400, 50)) < 0.15] = np.nan
    X[:, 5] = 1e10 * (rng.random(400) < 0.3)  # inf-clip magnitudes
    X[:, 8] = 2.5  # constant column -> NaN corr
    X[:, 11] = np.nan  # all-missing column

    got = _pairwise_complete_corr(X)
    want = pd.DataFrame(X).corr().to_numpy()
    assert np.array_equal(np.isfinite(got), np.isfinite(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want),
                               rtol=1e-10, atol=1e-10)


def test_prune_drops_second_of_pair_and_ranks_by_gain():
    rng = np.random.default_rng(1)
    n = 300
    a = rng.normal(size=n)
    X = np.stack([a, a * 2.0 + 1e-6 * rng.normal(size=n),
                  rng.normal(size=n), rng.normal(size=n)], axis=1)
    names = ["a", "a_scaled", "b", "c"]
    pairs, drop = correlation_prune(X, names, threshold=0.95)
    assert drop == {"a_scaled"}
    assert list(pairs["feature_1"]) == ["a"]

    gains = np.array([1.0, 5.0, 3.0, 2.0])
    res = select_features(X, names, gains, top_k=2)
    # a_scaled pruned despite highest gain; survivors ranked by gain
    assert res.selected == ["b", "c"]
