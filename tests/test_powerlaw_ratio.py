"""v65 powerlaw-ratio / MaxVar features vs an inline NumPy oracle
implementing reference scripts/train_v65_powerlaw_ratio.py:47-170
(``extract_powerlaw_features``) verbatim."""

import numpy as np

from tests.test_feature_parity import assert_parity


def _oracle(sub):
    from scipy.stats import median_abs_deviation

    feats = {}
    for band in ("g", "r", "i"):
        b = sub[sub["Filter"] == band].sort_values("Time (MJD)")
        if len(b) < 5:
            feats[f"{band}_maxvar"] = np.nan
            feats[f"{band}_power_exponent"] = np.nan
            feats[f"{band}_late_frac"] = np.nan
            continue
        flux = b["Flux"].to_numpy()
        times = b["Time (MJD)"].to_numpy()

        max_flux = np.max(flux)
        median_flux = np.median(flux)
        mad = median_abs_deviation(flux)
        feats[f"{band}_maxvar"] = ((max_flux - median_flux) / mad
                                   if mad > 0 else np.nan)

        baseline = np.percentile(flux, 10)
        feats[f"{band}_peak_baseline_ratio"] = (max_flux / baseline
                                                if baseline > 0 else np.nan)

        peak_idx = np.argmax(flux)
        peak_time = times[peak_idx]
        peak_flux = flux[peak_idx]

        post_mask = times > peak_time + 5
        if np.sum(post_mask) >= 3:
            post_times = times[post_mask] - peak_time
            post_flux = flux[post_mask]
            valid = (post_flux > 0) & (post_times > 0)
            if np.sum(valid) >= 3:
                coeffs = np.polyfit(np.log10(post_times[valid]),
                                    np.log10(post_flux[valid]), 1)
                feats[f"{band}_power_exponent"] = coeffs[0]
            else:
                feats[f"{band}_power_exponent"] = np.nan
        else:
            feats[f"{band}_power_exponent"] = np.nan

        late_mask = times > peak_time + 50
        feats[f"{band}_late_frac"] = (np.mean(flux[late_mask]) / peak_flux
                                      if np.sum(late_mask) > 0 and peak_flux > 0
                                      else np.nan)
        very_late = times > peak_time + 100
        feats[f"{band}_very_late_frac"] = (np.mean(flux[very_late]) / peak_flux
                                           if np.sum(very_late) > 0
                                           and peak_flux > 0 else np.nan)

    exps = [feats.get(f"{b}_power_exponent", np.nan) for b in ("g", "r", "i")]
    fin = [e for e in exps if not np.isnan(e)]
    if len(fin) >= 2:
        feats["power_exp_std"] = np.std(fin)
        feats["power_exp_mean"] = np.mean(fin)
        feats["power_exp_min"] = np.min(fin)
    else:
        feats["power_exp_std"] = np.nan
        feats["power_exp_mean"] = np.nan
        feats["power_exp_min"] = np.nan

    r_exp = feats.get("r_power_exponent", np.nan)
    feats["tde_decay_score"] = (-np.abs(r_exp + 1.67)
                                if not np.isnan(r_exp) else np.nan)

    mvs = [feats.get(f"{b}_maxvar", np.nan) for b in ("g", "r")]
    fin = [m for m in mvs if not np.isnan(m)]
    if fin:
        feats["maxvar_mean"] = np.mean(fin)
        feats["maxvar_max"] = np.max(fin)
    else:
        feats["maxvar_mean"] = np.nan
        feats["maxvar_max"] = np.nan
    return feats


def test_powerlaw_ratio_parity(small_dataset):
    import pandas as pd

    from mallorn_tpu.features import powerlaw_ratio
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)

    rows = []
    for oid in meta.object_ids:
        r = _oracle(lc[lc["object_id"] == oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = powerlaw_ratio.extract(packed)
    assert_parity(ours, ref, meta)


def test_powerlaw_ratio_names(tiny_dataset):
    from mallorn_tpu.features import powerlaw_ratio

    packed, _, _ = tiny_dataset
    out = powerlaw_ratio.extract(packed)
    for b in ("g", "r", "i"):
        for n in ("maxvar", "peak_baseline_ratio", "power_exponent",
                  "late_frac", "very_late_frac"):
            assert f"{b}_{n}" in out
    for n in ("power_exp_std", "power_exp_mean", "power_exp_min",
              "tde_decay_score", "maxvar_mean", "maxvar_max"):
        assert n in out
    n_obj = packed.n_objects
    for v in out.values():
        assert v.shape == (n_obj,)
