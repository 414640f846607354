"""v65 power-law-decay + MaxVar variability features.

TPU re-design of reference scripts/train_v65_powerlaw_ratio.py:47-170
(``extract_powerlaw_features``) — the per-object pandas groupby loop
becomes one vmapped masked kernel over the packed [N, 6, T] tensors.

Per band (g, r, i), on bands with >= 5 points (ref :67):
- ``{b}_maxvar``             (max - median) / MAD, NaN when MAD == 0 (:76-83)
- ``{b}_peak_baseline_ratio`` max / 10th-percentile baseline, NaN when
                              baseline <= 0 (:85-90)
- ``{b}_power_exponent``     log10-log10 polyfit slope over post-peak
                              points (t > peak + 5 d, flux > 0, >= 3
                              valid) — TDE decays at ~ -5/3 (:92-115)
- ``{b}_late_frac``          mean flux beyond peak+50 d / peak flux (:117-123)
- ``{b}_very_late_frac``     mean flux beyond peak+100 d / peak flux (:125-131)

Cross-band (:133-166):
- ``power_exp_std/mean/min`` over the >= 2 finite band exponents
  (population std, matching np.std ddof=0)
- ``tde_decay_score``        -|r_exponent + 1.67| (the script's literal
                              1.67, not 5/3)
- ``maxvar_mean/maxvar_max`` over the finite g/r maxvars (i excluded, :157-158)

The v66 "lean maxvar" workflow (scripts/train_v66_lean_maxvar.py) is a
feature-subset run over these same features + the v34a importance
ranking — covered by ``train/feature_selection.py`` + this module.
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M

BANDS = ((1, "g"), (2, "r"), (3, "i"))


def _band_feats(t, f, mask):
    n = M.count(mask)
    ok5 = n >= 5
    nan = jnp.float32(jnp.nan)

    mx = M.mmax(f, mask)
    med = M.median(f, mask)
    mad = M.mad(f, mask)
    maxvar = jnp.where(ok5 & (mad > 0), (mx - med) / jnp.where(mad > 0, mad, 1.0), nan)

    baseline = M.quantile(f, mask, 0.10)
    pbr = jnp.where(ok5 & (baseline > 0), mx / jnp.where(baseline > 0, baseline, 1.0), nan)

    # peak = first occurrence of the max in time order (np.argmax, :92-94)
    pi = M.argmax(f, mask)
    peak_t = jnp.take(t, pi)
    peak_f = jnp.take(f, pi)

    # post-peak log-log slope (:97-115)
    post = mask & (t > peak_t + 5.0)
    valid = post & (f > 0) & (t - peak_t > 0)
    lt = jnp.log10(jnp.where(valid, t - peak_t, 1.0))
    lf = jnp.log10(jnp.where(valid, f, 1.0))
    slope, _ = M.linfit(lt, lf, valid)
    pexp = jnp.where(ok5 & (M.count(post) >= 3) & (M.count(valid) >= 3), slope, nan)

    late = mask & (t > peak_t + 50.0)
    lfrac = jnp.where(ok5 & (M.count(late) > 0) & (peak_f > 0),
                      M.mean(f, late) / jnp.where(peak_f > 0, peak_f, 1.0), nan)
    vlate = mask & (t > peak_t + 100.0)
    vfrac = jnp.where(ok5 & (M.count(vlate) > 0) & (peak_f > 0),
                      M.mean(f, vlate) / jnp.where(peak_f > 0, peak_f, 1.0), nan)
    return maxvar, pbr, pexp, lfrac, vfrac


def _kernel(v: ObjectView) -> FeatureSet:
    feats: FeatureSet = {}
    per_band = {}
    for bi, b in BANDS:
        vals = _band_feats(v.band_time[bi], v.band_flux[bi], v.band_mask[bi])
        per_band[b] = vals
        for name, val in zip(("maxvar", "peak_baseline_ratio",
                              "power_exponent", "late_frac",
                              "very_late_frac"), vals):
            feats[f"{b}_{name}"] = val

    exps = jnp.stack([per_band[b][2] for _, b in BANDS])
    emask = ~jnp.isnan(exps)
    ge2 = M.count(emask) >= 2
    nan = jnp.float32(jnp.nan)
    feats["power_exp_std"] = jnp.where(ge2, M.std(exps, emask), nan)
    feats["power_exp_mean"] = jnp.where(ge2, M.mean(exps, emask), nan)
    feats["power_exp_min"] = jnp.where(ge2, M.mmin(exps, emask), nan)

    r_exp = per_band["r"][2]
    feats["tde_decay_score"] = jnp.where(
        ~jnp.isnan(r_exp), -jnp.abs(r_exp + 1.67), nan)

    mvs = jnp.stack([per_band["g"][0], per_band["r"][0]])
    mmask = ~jnp.isnan(mvs)
    ge1 = M.count(mmask) >= 1
    feats["maxvar_mean"] = jnp.where(ge1, M.mean(mvs, mmask), nan)
    feats["maxvar_max"] = jnp.where(ge1, M.mmax(mvs, mmask), nan)
    return feats


_extract = vmap_features(_kernel)


def extract(packed, meta=None) -> FeatureSet:
    return _extract(packed)
