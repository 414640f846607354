"""Golden parity for shape / colors / physics / tde-physics features vs the
reference implementations, on the shared synthetic dataset."""

import numpy as np
import pytest

from tests.conftest import requires_reference

# f32-ill-conditioned features get looser relative tolerance (all are
# quotients of small differences; GBDT bins cannot resolve the gap).
_LOOSE = {
    "max_slope": 1e-2, "maximum_slope": 1e-2, "curvature": 2e-2,
    "slope": 5e-3, "trend": 5e-3,
    "consistency": 5e-3, "stability": 5e-3, "alpha": 5e-3, "residual": 5e-3,
    "rebrightening": 5e-3, "sf_": 5e-3, "stetson": 5e-3, "excess_variance": 5e-3,
    "color_var": 5e-3, "color_range": 5e-3, "rise_shape": 5e-3,
    "temp": 5e-3, "range": 5e-3, "_std": 5e-3,
}


def assert_parity(ours, ref_df, meta, rtol=5e-4, atol=1e-3, skip=()):
    ref_df = ref_df.set_index("object_id").reindex(meta.object_ids)
    names = [c for c in ref_df.columns if c != "object_id"]
    missing = [n for n in names if n not in ours]
    assert not missing, f"features missing from ours: {missing}"
    failures = []
    for name in names:
        if name in skip:
            continue
        got = np.asarray(ours[name], dtype=np.float64)
        want = ref_df[name].to_numpy(dtype=np.float64)
        nan_g, nan_w = np.isnan(got), np.isnan(want)
        if (nan_g != nan_w).any():
            failures.append(
                f"{name}: NaN mismatch rows {np.where(nan_g != nan_w)[0][:8]}")
            continue
        ok = ~nan_w
        rt = max([rtol] + [v for k, v in _LOOSE.items() if k in name])
        at = max(atol, rt)
        bad = ~np.isclose(got[ok], want[ok], rtol=rt, atol=at)
        if bad.any():
            g, w = got[ok][bad], want[ok][bad]
            failures.append(
                f"{name}: {bad.sum()}/{ok.sum()} mismatch "
                f"(got {g[:3]} want {w[:3]})")
    assert not failures, "\n".join(failures)


@requires_reference
def test_shape_parity(small_dataset, ref_src):
    from features.lightcurve_shape import extract_shape_features
    from mallorn_tpu.features import shape
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    ref = extract_shape_features(lc, list(meta.object_ids))
    ours = shape.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_colors_parity(small_dataset, ref_src):
    from features.colors import extract_color_features
    from mallorn_tpu.features import colors
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    ref = extract_color_features(lc, list(meta.object_ids))
    ours = colors.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_physics_parity(small_dataset, ref_src):
    from features.physics_based import extract_physics_features
    from mallorn_tpu.features import physics
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, log = to_reference_frames(cols, meta)
    ref = extract_physics_features(lc, log, list(meta.object_ids))
    ours = physics.extract(packed, meta)
    assert_parity(ours, ref, meta)


@requires_reference
def test_tde_parity(small_dataset, ref_src):
    from features.tde_physics import extract_tde_physics_features
    from mallorn_tpu.features import tde
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    ref = extract_tde_physics_features(lc, list(meta.object_ids))
    ours = tde.extract(packed)
    assert_parity(ours, ref, meta)
