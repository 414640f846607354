"""Tests for cesium (reference parity), DTW (exact-DP sanity + pipeline),
and 1D GP (recovery + guards)."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_feature_parity import assert_parity


@requires_reference
def test_cesium_parity(small_dataset, ref_src):
    import pandas as pd
    from features.cesium_features import extract_cesium_features_single
    from mallorn_tpu.features import cesium
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_cesium_features_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = cesium.extract(packed)
    assert_parity(ours, ref, meta)


def test_dtw_exact_dp():
    """Exact DTW matches a simple O(P^2) NumPy DP."""
    import jax.numpy as jnp
    from mallorn_tpu.features.dtw import _dtw

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, 50).astype(np.float32)
    y = rng.uniform(0, 1, 50).astype(np.float32)

    # numpy reference DP
    P = 50
    c = np.abs(x[:, None] - y[None, :])
    D = np.full((P, P), np.inf)
    D[0, 0] = c[0, 0]
    for j in range(1, P):
        D[0, j] = c[0, j] + D[0, j - 1]
    for i in range(1, P):
        D[i, 0] = c[i, 0] + D[i - 1, 0]
        for j in range(1, P):
            D[i, j] = c[i, j] + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])

    dist, warp = _dtw(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(dist), D[-1, -1], rtol=1e-5)
    assert 0.0 <= float(warp) < 1.0
    # identical curves -> zero distance, zero warp
    d2, w2 = _dtw(jnp.asarray(x), jnp.asarray(x))
    assert float(d2) < 1e-6 and float(w2) < 1e-6


def test_dtw_pipeline(small_dataset):
    from mallorn_tpu.features import dtw

    packed, meta, _ = small_dataset
    templates = dtw.build_templates(packed, meta.target)
    assert templates.shape == (2, 6, 50)
    feats = dtw.extract(packed, templates)
    r = np.asarray(feats["r_dtw_ratio"])
    assert np.isfinite(r).sum() > 0.5 * len(r)
    # TDEs should on average be closer to the TDE template
    ratio = np.asarray(feats["dtw_ratio_mean"])
    tde = meta.target == 1
    both = np.isfinite(ratio)
    if tde[both].sum() >= 3:
        assert np.nanmedian(ratio[both & tde]) <= np.nanmedian(ratio[both & ~tde]) + 0.2


def test_gp1d_guards_and_recovery(tiny_dataset):
    from mallorn_tpu.features import gp1d

    packed, meta, _ = tiny_dataset
    feats = gp1d.extract(packed, n_steps=80)
    ls = np.asarray(feats["r_gp_length_scale"])
    assert ls.shape == (packed.n_objects,)
    ok = np.isfinite(ls)
    assert ok.sum() > 0
    assert (ls[ok] > 0).all()
    ll = np.asarray(feats["r_gp_log_likelihood"])
    assert np.isfinite(ll[ok]).all()
