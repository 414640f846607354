"""advanced_physics vs the reference. The SED temperatures come from an
optimizer (scipy TRF with a pathological p0 vs our multi-start log-amp LM),
so optimizer-derived columns are gated on quality rather than equality;
the pure-array columns (late colors, asymmetry block) must match exactly."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_feature_parity import assert_parity

# columns downstream of the Planck fit (optimizer-dependent)
_FIT_COLS_PREFIX = ("temp_epoch_", "temp_chi2_epoch_", "cooling_rate_",
                    "temp_dispersion_", "sed_quality_")


@requires_reference
def test_advanced_physics_array_columns(small_dataset, ref_src):
    import pandas as pd
    from features.advanced_physics import extract_advanced_physics_features_single
    from mallorn_tpu.features import advanced_physics
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_advanced_physics_features_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = advanced_physics.extract(packed)

    fit_cols = [c for c in ref.columns
                if any(c.startswith(p) for p in _FIT_COLS_PREFIX)]
    assert_parity(ours, ref, meta, skip=tuple(fit_cols))


@requires_reference
def test_advanced_physics_temperatures_sane(small_dataset, ref_src):
    """Where both pipelines produce a temperature, both must lie in the
    Planck-fit bounds; our fit count should be >= the reference's (its
    p0=(15000, 1.0) start frequently fails within 500 evals)."""
    import pandas as pd
    from features.advanced_physics import extract_advanced_physics_features_single
    from mallorn_tpu.features import advanced_physics
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    ref_rows = [extract_advanced_physics_features_single(grouped[o])
                for o in meta.object_ids]
    ours = advanced_physics.extract(packed)

    got = np.asarray(ours["temp_epoch_0d"])
    want = np.array([r["temp_epoch_0d"] for r in ref_rows])
    ok_g = np.isfinite(got)
    assert ok_g.sum() >= np.isfinite(want).sum() * 0.8
    assert (got[ok_g] >= 3000).all() and (got[ok_g] <= 100000).all()
