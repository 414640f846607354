"""Batched LM Bazin fits vs the reference's scipy curve_fit pipeline.

Parity contract (SURVEY.md §7.3): not bit-identical iterates — the gate is
(a) identical NaN/guard semantics, (b) fit quality: our achieved chi^2
matches or beats scipy's on the same problems, (c) derived features agree
where the optimum is well-determined.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference
from mallorn_tpu.utils.constants import LSST_BANDS


@pytest.fixture(scope="module")
def fits(small_dataset):
    from mallorn_tpu.features import bazin

    packed, meta, cols = small_dataset
    ours = {k: np.asarray(v) for k, v in bazin.extract(packed).items()}
    return packed, meta, cols, ours


def test_lm_recovers_known_bazin_curve():
    """Sanity: noiseless Bazin data -> near-exact parameter recovery."""
    import jax.numpy as jnp
    from mallorn_tpu.features.bazin import bazin_model
    from mallorn_tpu.ops.lm import lm_fit_batched

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 200, size=(8, 40))).astype(np.float32)
    true = np.stack([
        rng.uniform(50, 200, 8),  # A
        rng.uniform(60, 140, 8),  # t0
        rng.uniform(5, 25, 8),  # tau_rise
        rng.uniform(20, 60, 8),  # tau_fall
        rng.uniform(-5, 5, 8),  # B
    ], axis=1).astype(np.float32)
    y = np.stack([np.asarray(bazin_model(jnp.asarray(t[i]), true[i]))
                  for i in range(8)])
    sigma = np.ones_like(y)
    mask = np.ones_like(y, bool)

    theta0 = true * rng.uniform(0.7, 1.3, true.shape)
    lb = np.tile(np.array([0, 0, 0.1, 0.1, -50], np.float32), (8, 1))
    ub = np.tile(np.array([600, 200, 200, 200, 50], np.float32), (8, 1))
    res = lm_fit_batched(bazin_model, t, y, sigma, mask,
                         theta0.astype(np.float32), lb, ub, n_iters=80)
    assert bool(res.valid.all())
    # cost ~ 0 for noiseless data
    assert np.asarray(res.cost).max() < 1e-2, np.asarray(res.cost)


@requires_reference
def test_bazin_parity_nan_and_chi2(fits, ref_src):
    from features.bazin_fitting import extract_bazin_features
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols, ours = fits
    lc, _ = to_reference_frames(cols, meta)
    ref = extract_bazin_features(lc, list(meta.object_ids))
    ref = ref.set_index("object_id").reindex(meta.object_ids)

    n_lanes = both = ours_better = ref_only = 0
    ratios = []
    for bi, band in enumerate(LSST_BANDS):
        chi_ref = ref[f"{band}_bazin_fit_chi2"].to_numpy()
        chi_ours = ours[f"{band}_bazin_fit_chi2"][:, ]
        # count lanes (reference NaN == guard-failed or fit-failed)
        for i in range(len(chi_ref)):
            n_lanes += 1
            r_ok, o_ok = np.isfinite(chi_ref[i]), np.isfinite(chi_ours[i])
            if r_ok and o_ok:
                both += 1
                ratios.append(chi_ours[i] / max(chi_ref[i], 1e-9))
                if chi_ours[i] <= chi_ref[i] * 1.05 + 0.5:
                    ours_better += 1
            elif r_ok and not o_ok:
                ref_only += 1

    assert both > 0.8 * n_lanes, (both, n_lanes)
    # we may succeed where scipy failed, but rarely the reverse
    assert ref_only < 0.02 * n_lanes, (ref_only, n_lanes)
    # on shared successes we match or beat scipy's cost almost always
    frac_good = ours_better / both
    assert frac_good > 0.9, frac_good
    assert np.median(ratios) < 1.05, np.median(ratios)


@requires_reference
def test_bazin_guard_semantics(ref_src):
    """< 5 points in a band -> NaN row, matching the reference guard."""
    from mallorn_tpu.data.packing import pack_lightcurves
    from mallorn_tpu.features import bazin

    rng = np.random.default_rng(1)
    # object 0: r band with 4 points (guard), g with 12 (fit)
    obj = np.array([0] * 4 + [0] * 12)
    band = np.array([2] * 4 + [1] * 12)
    t = np.concatenate([np.sort(rng.uniform(0, 100, 4)),
                        np.sort(rng.uniform(0, 100, 12))])
    f = rng.uniform(10, 100, 16)
    e = rng.uniform(0.5, 2, 16)
    packed = pack_lightcurves(obj, t, f, e, band, 1)
    feats = {k: np.asarray(v) for k, v in bazin.extract(packed).items()}
    assert np.isnan(feats["r_bazin_A"][0])
    assert np.isnan(feats["u_bazin_A"][0])  # empty band
    # g has 12 points; fit should produce something finite (flat data may
    # still fit within bounds)
    assert np.isfinite(feats["g_bazin_fit_chi2"][0]) or np.isnan(feats["g_bazin_A"][0])
