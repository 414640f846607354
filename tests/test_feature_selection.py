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


def test_cached_select_features_roundtrip(tmp_path):
    """The staged selection artifact loads back EXACTLY (selected set,
    importance order, corr pairs) and skips the importance fit; a data or
    config change recomputes (reference selected_features.pkl semantics,
    scripts/feature_selection.py:352-358)."""
    from mallorn_tpu.train.feature_selection import (cached_select_features,
                                                     select_features)

    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 12))
    X[:, 5] = X[:, 4] * 1.0001  # correlated pair -> dropped
    names = [f"f{i}" for i in range(12)]
    y = (X[:, 0] > 0).astype(float)
    gains = rng.uniform(1, 10, size=12)

    calls = []

    def imp():
        calls.append(1)
        return gains

    path = tmp_path / "sel.npz"
    res1 = cached_select_features(path, X, y, names, imp, top_k=6)
    assert len(calls) == 1 and path.exists()
    res2 = cached_select_features(path, X, y, names, imp, top_k=6)
    assert len(calls) == 1, "cache hit must skip the importance fit"
    assert res2.selected == res1.selected
    assert res2.dropped_correlated == res1.dropped_correlated
    want = select_features(X, names, gains, top_k=6)
    assert res1.selected == want.selected
    np.testing.assert_allclose(
        res2.importance["gain"].to_numpy(),
        want.importance["gain"].to_numpy())
    # digest invalidation: different y -> recompute
    cached_select_features(path, X, 1 - y, names, imp, top_k=6)
    assert len(calls) == 2
    # different config digest -> recompute
    cached_select_features(path, X, 1 - y, names, imp, top_k=6,
                           key_extra="other-params")
    assert len(calls) == 3
