"""Golden parity: statistical features vs the reference implementation."""

import numpy as np
import pytest

from tests.conftest import requires_reference


# Features whose f32 evaluation is ill-conditioned (tiny-dt quotients);
# errors are orders of magnitude below the GBDT's 256-bin resolution.
_LOOSE = {"max_slope": 1e-2}


def _assert_feature_parity(ours, ref_df, names, meta, rtol=5e-4, atol=5e-4):
    ref_df = ref_df.set_index("object_id").reindex(meta.object_ids)
    for name in names:
        got = np.asarray(ours[name], dtype=np.float64)
        want = ref_df[name].to_numpy(dtype=np.float64)
        nan_g, nan_w = np.isnan(got), np.isnan(want)
        assert (nan_g == nan_w).all(), (
            f"{name}: NaN mismatch at rows {np.where(nan_g != nan_w)[0][:10]}"
        )
        ok = ~nan_w
        rt = max([rtol] + [v for k, v in _LOOSE.items() if k in name])
        np.testing.assert_allclose(
            got[ok], want[ok], rtol=rt, atol=atol, err_msg=name)


@requires_reference
def test_statistical_parity(small_dataset, ref_src):
    from features.statistical import extract_statistical_features
    from mallorn_tpu.features import statistical
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, log = to_reference_frames(cols, meta)

    ref = extract_statistical_features(lc, list(meta.object_ids))
    ours = statistical.extract(packed)

    names = [c for c in ref.columns if c != "object_id"]
    _assert_feature_parity(ours, ref, names, meta)


@requires_reference
def test_statistical_parity_with_missing_bands(ref_src):
    """Objects with empty bands and tiny bands exercise the NaN contract."""
    from features.statistical import extract_statistical_features
    from mallorn_tpu.data.packing import Metadata, pack_lightcurves
    from mallorn_tpu.features import statistical
    from tests.oracles.frames import to_reference_frames

    rng = np.random.default_rng(0)
    rows = []
    # object 0: only r band, 1 obs; object 1: g(2 obs) r(7); object 2: full
    spec = {0: {2: 1}, 1: {1: 2, 2: 7}, 2: {b: 9 for b in range(6)}}
    obj, t, f, e, b = [], [], [], [], []
    for oid, bands in spec.items():
        for bi, n in bands.items():
            obj += [oid] * n
            tt = np.sort(rng.uniform(0, 200, n))
            t += list(tt)
            f += list(rng.normal(50, 20, n))
            e += list(rng.uniform(0.5, 5, n))
            b += [bi] * n
    cols = {
        "object_index": np.array(obj), "time": np.array(t),
        "flux": np.array(f), "flux_err": np.array(e), "band": np.array(b),
    }
    meta = Metadata(
        object_ids=np.array([f"OBJ{i}" for i in range(3)]),
        z=np.zeros(3, np.float32), ebv=np.zeros(3, np.float32))
    packed = pack_lightcurves(cols["object_index"], cols["time"], cols["flux"],
                              cols["flux_err"], cols["band"], 3)

    lc, log = to_reference_frames(cols, meta)
    ref = extract_statistical_features(lc, list(meta.object_ids))
    ours = statistical.extract(packed)
    names = [c for c in ref.columns if c != "object_id"]
    _assert_feature_parity(ours, ref, names, meta)


def test_metadata_features(small_dataset):
    from mallorn_tpu.features import statistical

    packed, meta, _ = small_dataset
    feats = statistical.extract(packed, meta)
    np.testing.assert_allclose(np.asarray(feats["luminosity_distance"]),
                               meta.z * 4280.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(feats["time_dilation"]),
                               1.0 + meta.z, rtol=1e-6)
