"""v37a TDE model fits: guard semantics + chi2 quality vs the reference's
scipy pipeline on the shared synthetic dataset."""

import numpy as np
import pytest

from tests.conftest import requires_reference


@pytest.mark.parametrize("model_type", ["hybrid", "guillochon", "piecewise"])
def test_smoke_and_guards(tiny_dataset, model_type):
    from mallorn_tpu.features import tde_models

    packed, meta, _ = tiny_dataset
    feats = tde_models.extract(packed, model_type=model_type, n_iters=30)
    assert len(feats) == 6 * 9 + 7
    a = np.asarray(feats["r_tde_A"])
    assert a.shape == (packed.n_objects,)


@requires_reference
@pytest.mark.parametrize("model_type", ["hybrid", "guillochon", "piecewise"])
def test_chi2_quality_vs_reference(small_dataset, ref_src, model_type):
    from features.tde_physics_model import extract_tde_features_single
    from mallorn_tpu.features import tde_models
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    ours = {k: np.asarray(v) for k, v in
            tde_models.extract(packed, model_type=model_type).items()}

    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}

    n_ref = n_both = n_good = 0
    for i, oid in enumerate(meta.object_ids[:32]):
        ref = extract_tde_features_single(grouped[oid], model_type)
        for band in ["g", "r", "i"]:
            cr = ref.get(f"{band}_tde_fit_chi2", np.nan)
            co = ours[f"{band}_tde_fit_chi2"][i]
            if np.isfinite(cr):
                n_ref += 1
                if np.isfinite(co):
                    n_both += 1
                    if co <= cr * 1.1 + 0.5:
                        n_good += 1
    assert n_ref > 30, n_ref
    assert n_both > 0.9 * n_ref, (n_both, n_ref)
    assert n_good > 0.85 * n_both, (n_good, n_both)
