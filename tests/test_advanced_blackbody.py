"""Advanced features parity + blackbody sanity/quality."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_feature_parity import assert_parity


@requires_reference
def test_advanced_parity(small_dataset, ref_src):
    import pandas as pd
    from features.advanced_features import extract_advanced_features_single
    from mallorn_tpu.features import advanced
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for i, oid in enumerate(meta.object_ids):
        r = extract_advanced_features_single(grouped[oid], float(meta.z[i]))
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = advanced.extract(packed, meta)
    assert_parity(ours, ref, meta)


def test_blackbody_runs_and_discriminates(small_dataset):
    from mallorn_tpu.features import blackbody

    packed, meta, _ = small_dataset
    feats = blackbody.extract(packed)
    assert len(feats) == 49
    tp = np.asarray(feats["T_peak"])
    ok = np.isfinite(tp)
    assert ok.sum() > 0.3 * len(tp)
    assert (tp[ok] >= 3000).all() and (tp[ok] <= 100000).all()
    # hot synthetic TDEs should fit hotter than cooling SNe on average
    tde = meta.target == 1
    if (ok & tde).sum() >= 3:
        assert np.nanmedian(tp[tde]) > np.nanmedian(tp[~tde]) * 0.8
