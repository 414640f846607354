"""Parity tests for the wider feature-module surface: time_to_decline,
fourier, enhanced_colors, high_snr, interactions, categorical."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_feature_parity import assert_parity


@requires_reference
def test_time_to_decline_parity(small_dataset, ref_src):
    from features.time_to_decline import extract_time_to_decline_single
    import pandas as pd
    from mallorn_tpu.features import time_to_decline
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_time_to_decline_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = time_to_decline.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_fourier_parity(small_dataset, ref_src):
    from features.fourier_features import extract_fourier_features_single_band
    import pandas as pd
    from mallorn_tpu.features import fourier
    from tests.oracles.frames import to_reference_frames
    from mallorn_tpu.utils.constants import LSST_BANDS

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    rows = []
    for oid in meta.object_ids:
        sub = lc[lc["object_id"] == oid]
        r = {"object_id": oid}
        for band in LSST_BANDS:
            b = sub[sub["Filter"] == band].sort_values("Time (MJD)")
            r.update(extract_fourier_features_single_band(
                b["Time (MJD)"].to_numpy(), b["Flux"].to_numpy(), band))
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = fourier.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_enhanced_colors_parity(small_dataset, ref_src):
    from features.enhanced_colors import extract_enhanced_colors_single
    import pandas as pd
    from mallorn_tpu.features import enhanced_colors
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_enhanced_colors_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = enhanced_colors.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_high_snr_parity(small_dataset, ref_src):
    from features.high_snr_physics import extract_high_snr_features_single
    import pandas as pd
    from mallorn_tpu.features import high_snr
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_high_snr_features_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = high_snr.extract(packed)
    assert_parity(ours, ref, meta)


def test_interactions_and_categorical(small_dataset):
    from mallorn_tpu.features import categorical, interactions, statistical
    from mallorn_tpu.features import colors as colors_mod

    from mallorn_tpu.features import shape as shape_mod

    packed, meta, _ = small_dataset
    feats = {k: np.asarray(v) for k, v in
             statistical.extract(packed, meta).items()}
    feats.update({k: np.asarray(v) for k, v in
                  colors_mod.extract(packed).items()})
    feats.update({k: np.asarray(v) for k, v in
                  shape_mod.extract(packed).items()})

    inter = interactions.create_physics_interactions(feats)
    assert "temp_cooling_ratio" not in inter  # needs physics features
    assert "r_skew_x_std" in inter and "rise_ratio_g_r" in inter
    y = meta.target
    top = interactions.select_top_interactions(
        inter, y, top_k=10, min_samples=20)
    assert len(top) <= 10

    cats, names = categorical.add_categorical_features(feats)
    assert "z_category" in names and "brightness_category" in names
    for n in names:
        assert set(np.unique(cats[n])) <= {0, 1, 2, 3}
