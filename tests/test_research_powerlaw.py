"""Parity: research features vs the reference module; v55 power-law R^2
quality vs scipy fits."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_feature_parity import assert_parity


@requires_reference
def test_research_parity(small_dataset, ref_src):
    from features.research_features import extract_research_features
    from mallorn_tpu.features import research
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, log = to_reference_frames(cols, meta)
    ref = extract_research_features(lc, list(meta.object_ids), log)
    ours = research.extract(packed, meta)
    assert_parity(ours, ref, meta)


@requires_reference
@pytest.mark.slow
def test_v55_powerlaw_r2_quality(small_dataset, ref_src):
    """R^2 features: same guards as scipy pipeline; where both fit, our R^2
    matches or beats scipy's (multi-start LM vs single TRF run)."""
    import sys
    from scipy.optimize import curve_fit

    from mallorn_tpu.features import powerlaw
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    ours = {k: np.asarray(v) for k, v in powerlaw.extract(packed).items()}

    lc, _ = to_reference_frames(cols, meta)

    def powerlaw_5_3(t, A, t0):
        return A * np.power(np.maximum(t - t0, 0.1), -5 / 3)

    def exponential(t, A, tau, t0):
        return A * np.exp(-np.maximum(t - t0, 0) / tau)

    n_checked = n_we_match = 0
    for band in ["g", "r", "i"]:
        for model_name, func, p0f, bounds in (
            ("powerlaw_5_3", powerlaw_5_3, lambda pf: [pf, 0], ([0, -10], [1e6, 10])),
            ("exponential", exponential, lambda pf: [pf, 30, 0], ([0, 1, -10], [1e6, 500, 10])),
        ):
            for i, oid in enumerate(meta.object_ids):
                sub = lc[(lc["object_id"] == oid) & (lc["Filter"] == band)]
                sub = sub.sort_values("Time (MJD)")
                if len(sub) < 5:
                    assert np.isnan(ours[f"{band}_{model_name}_r2"][i])
                    continue
                t = sub["Time (MJD)"].to_numpy()
                f = sub["Flux"].to_numpy()
                pk = np.argmax(f)
                post = t > t[pk]
                if post.sum() < 3:
                    assert np.isnan(ours[f"{band}_{model_name}_r2"][i])
                    continue
                tp, fp = t[post] - t[pk], f[post]
                try:
                    popt, _ = curve_fit(func, tp, fp, p0=p0f(f[pk]),
                                        maxfev=1000, bounds=bounds)
                    pred = func(tp, *popt)
                    ss_res = np.sum((fp - pred) ** 2)
                    ss_tot = np.sum((fp - fp.mean()) ** 2)
                    r2_ref = 1 - ss_res / ss_tot if ss_tot > 0 else 0
                except Exception:
                    continue
                r2_us = ours[f"{band}_{model_name}_r2"][i]
                if np.isfinite(r2_us):
                    n_checked += 1
                    if r2_us >= r2_ref - 0.02:
                        n_we_match += 1
    assert n_checked > 100, n_checked
    assert n_we_match / n_checked > 0.93, (n_we_match, n_checked)


@pytest.mark.slow
def test_powerlaw_feature_names(tiny_dataset):
    from mallorn_tpu.features import powerlaw

    packed, meta, _ = tiny_dataset
    feats = powerlaw.extract(packed)
    assert len(feats) == 27  # 3 bands x 9 models
    assert "r_powerlaw_5_3_r2" in feats and "g_linear_r2" in feats
