"""v37a custom TDE parametric model fits (hybrid / Guillochon / piecewise).

TPU re-design of reference src/features/tde_physics_model.py: the
6-parameter bounded TRF fits per (object, band) become batched multi-start
LM lanes (ops/lm.py). Model forms (:41-157):

- hybrid: A * sigmoid((t-t0)/tr) * exp(-(t-t0)/tf)
            * [dt>0] (1 + dt/tf)^(-alpha) + B
- guillochon: A * min(((t-(t0-3tr))/(3tr))^0.4, 1)_+ * exp(-(t-t0)/tf) + B
- piecewise: A * clip((t-t0+tr)/tr, 0, 1) * [dt>0](1+dt/tf)^(-alpha) + B

Semantics preserved (:174-298): n >= 6 guard, initialization from the
low-40%-percentile baseline / half-light decay estimate, reference bounds
(infinite A/B bounds become generous data-scaled ones for the sigmoid
reparametrization), sigma weights, chi^2 from UNclipped params, parameter
clipping for the reported features, cross-band alpha/tau consistency
(:350-377).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mallorn_tpu.data.packing import PackedLightcurves
from mallorn_tpu.features.base import FeatureSet
from mallorn_tpu.ops import masked as M
from mallorn_tpu.ops.lm import lm_fit_batched
from mallorn_tpu.utils.constants import LSST_BANDS, N_BANDS

KEYS = ("tde_A", "tde_t0", "tde_tau_rise", "tde_tau_fall", "tde_alpha",
        "tde_B", "tde_fit_chi2", "tde_alpha_value", "tde_peak_flux")


def hybrid_model(t, theta):
    A, t0, tr, tf, alpha, B = theta
    dt = t - t0
    rise = jax.nn.sigmoid(dt / tr)
    decay = jnp.exp(jnp.clip(-dt / tf, -60.0, 60.0))
    pl = jnp.where(dt > 0, (1.0 + jnp.maximum(dt, 0.0) / tf) ** (-alpha), 1.0)
    return A * rise * decay * pl + B


def guillochon_model(t, theta):
    A, t0, tr, tf, B = theta
    t_norm = t - (t0 - 3.0 * tr)
    base = jnp.maximum(t_norm / (3.0 * tr), 0.0)
    rise = jnp.where(t_norm > 0, base ** 0.4, 0.0)
    rise = jnp.minimum(rise, 1.0)
    decay = jnp.exp(jnp.clip(-(t - t0) / tf, -60.0, 60.0))
    return A * rise * decay + B


def piecewise_model(t, theta):
    A, t0, tr, tf, alpha, B = theta
    rise = jnp.clip((t - (t0 - tr)) / tr, 0.0, 1.0)
    dt = t - t0
    pl = jnp.where(dt > 0, (1.0 + jnp.maximum(dt, 0.0) / tf) ** (-alpha), 1.0)
    return A * rise * pl + B


def _fit_lanes(t, f, e, mask, model_type: str, n_iters: int):
    n = M.count(mask)
    peak_idx = M.argmax(f, mask)
    t_peak = jnp.take_along_axis(t, peak_idx[:, None], 1)[:, 0]
    f_peak = jnp.take_along_axis(f, peak_idx[:, None], 1)[:, 0]
    p40 = M.quantile(f, mask, 0.40)
    low = mask & (f < p40[:, None])
    f_base = M.median(f, low)  # NaN when the sub-40% set is empty

    t_first = M.mmin(t, mask)
    t_last = M.mmax(t, mask)

    pre = mask & (t < t_peak[:, None])
    any_pre = jnp.any(pre, axis=1)
    first_pre = M.mmin(t, pre)
    tr_guess = jnp.where(any_pre, (t_peak - first_pre) / 2.0, 30.0)
    tr_guess = jnp.clip(tr_guess, 5.0, 100.0)

    post_half = mask & (t > t_peak[:, None]) & (f < 0.5 * f_peak[:, None])
    any_half = jnp.any(post_half, axis=1)
    t_half = M.mmin(t, post_half)
    tf_guess = jnp.where(any_half, (t_half - t_peak) / jnp.log(2.0), 100.0)
    tf_guess = jnp.clip(tf_guess, 10.0, 500.0)

    A_guess = f_peak - f_base
    # generous data-scaled stand-ins for the reference's infinite A/B bounds
    amp_hi = jnp.maximum(100.0 * jnp.abs(f_peak), 1e4)

    zeros = jnp.zeros_like(f_peak)
    ones = jnp.ones_like(f_peak)
    tr_lo = 5.0 if model_type == "piecewise" else 1.0
    if model_type == "guillochon":
        theta0 = jnp.stack([A_guess, t_peak, tr_guess, tf_guess, f_base], 1)
        lb = jnp.stack([zeros, t_first - 50.0, 1.0 * ones, 10.0 * ones, -amp_hi], 1)
        ub = jnp.stack([amp_hi, t_last + 50.0, 200.0 * ones, 1000.0 * ones, amp_hi], 1)
        model = guillochon_model
        n_params = 5
    else:
        theta0 = jnp.stack([A_guess, t_peak, tr_guess, tf_guess,
                            1.67 * ones, f_base], 1)
        lb = jnp.stack([zeros, t_first - 50.0, tr_lo * ones, 10.0 * ones,
                        0.5 * ones, -amp_hi], 1)
        ub = jnp.stack([amp_hi, t_last + 50.0, 200.0 * ones, 1000.0 * ones,
                        3.0 * ones, amp_hi], 1)
        model = hybrid_model if model_type == "hybrid" else piecewise_model
        n_params = 6

    feasible = (n >= 6) & jnp.all(jnp.isfinite(theta0), axis=1) & (A_guess >= 0)

    # multi-start: reference init + a slow-fall and fast-rise variant
    s2 = theta0.at[:, 3].set(jnp.clip(2.5 * tf_guess, 10.0, 1000.0))
    s3 = theta0.at[:, 2].set(jnp.clip(0.3 * tr_guess, tr_lo, 200.0))
    starts = jnp.stack([theta0, s2, s3])

    res = lm_fit_batched(model, t, f, e, mask, starts, lb, ub, n_iters=n_iters)
    ok = feasible & res.valid

    theta = res.theta
    if model_type == "guillochon":
        A, t0, tr, tf, B = (theta[:, i] for i in range(5))
        alpha = jnp.full_like(A, 1.67)
    else:
        A, t0, tr, tf, alpha, B = (theta[:, i] for i in range(6))

    # chi2 from UNclipped params (reference :270-273)
    sig = jnp.where(e > 0, e, 1.0)
    pred = model(t.T, tuple(theta.T)).T
    r = jnp.where(mask, (f - pred) / sig, 0.0)
    chi2 = jnp.sum(r * r, axis=1)
    red_chi2 = jnp.clip(chi2 / jnp.maximum(n - n_params, 1), 0.0, 1e6)

    A_c = jnp.clip(A, -1e6, 1e6)
    t0_c = jnp.clip(t0, t_first - 100.0, t_last + 100.0)
    tr_c = jnp.clip(tr, 0.1, 300.0)
    tf_c = jnp.clip(tf, 1.0, 2000.0)
    al_c = jnp.clip(alpha, 0.1, 5.0)
    B_c = jnp.clip(B, -1e6, 1e6)

    nan = jnp.nan
    return {
        "tde_A": jnp.where(ok, A_c, nan),
        "tde_t0": jnp.where(ok, t0_c, nan),
        "tde_tau_rise": jnp.where(ok, tr_c, nan),
        "tde_tau_fall": jnp.where(ok, tf_c, nan),
        "tde_alpha": jnp.where(ok, al_c, nan),
        "tde_B": jnp.where(ok, B_c, nan),
        "tde_fit_chi2": jnp.where(ok, red_chi2, nan),
        "tde_alpha_value": jnp.where(ok, al_c, nan),
        "tde_peak_flux": jnp.where(ok, jnp.clip(A_c + B_c, -1e6, 1e6), nan),
    }


def _nan_cross(vals, fn_num, min_n=2):
    m = ~jnp.isnan(vals)
    n = jnp.sum(m, axis=1)
    mu = jnp.sum(jnp.where(m, vals, 0.0), 1) / jnp.maximum(n, 1)
    var = jnp.sum(jnp.where(m, (vals - mu[:, None]) ** 2, 0.0), 1) / jnp.maximum(n, 1)
    return mu, jnp.sqrt(var), n


def extract(packed: PackedLightcurves, meta=None, model_type: str = "hybrid",
            n_iters: int = 60) -> FeatureSet:
    N = packed.n_objects
    T = packed.band_time.shape[-1]
    t = packed.band_time.reshape(N * N_BANDS, T)
    f = packed.band_flux.reshape(N * N_BANDS, T)
    e = packed.band_err.reshape(N * N_BANDS, T)
    mask = packed.band_mask.reshape(N * N_BANDS, T)

    lanes = _fit_lanes(t, f, e, mask, model_type, n_iters)
    per_band = {k: v.reshape(N, N_BANDS) for k, v in lanes.items()}

    feats: FeatureSet = {}
    for bi, band in enumerate(LSST_BANDS):
        for key in KEYS:
            val = per_band[key][:, bi]
            if key == "tde_t0":
                val = val + packed.time_offset
            feats[f"{band}_{key}"] = val

    alpha = per_band["tde_alpha"]
    mu_a, sd_a, n_a = _nan_cross(alpha, None)
    abs_mu = jnp.sum(jnp.where(~jnp.isnan(alpha), jnp.abs(alpha), 0.0), 1) / jnp.maximum(n_a, 1)
    feats["tde_alpha_consistency"] = jnp.where(n_a >= 2, sd_a / abs_mu, jnp.nan)
    feats["tde_mean_alpha"] = jnp.where(n_a >= 2, mu_a, jnp.nan)
    feats["tde_alpha_deviation"] = jnp.where(n_a >= 2, jnp.abs(mu_a - 1.67), jnp.nan)

    for key, name in (("tde_tau_fall", "tde_tau_fall_consistency"),
                      ("tde_tau_rise", "tde_tau_rise_consistency")):
        # collected only over bands whose alpha is finite (reference :344-348)
        vals = jnp.where(~jnp.isnan(alpha), per_band[key], jnp.nan)
        mu, sd, n = _nan_cross(vals, None)
        feats[name] = jnp.where(n >= 2, sd / mu, jnp.nan)

    chi2 = jnp.where(~jnp.isnan(alpha), per_band["tde_fit_chi2"], jnp.nan)
    mu_c, sd_c, n_c = _nan_cross(chi2, None)
    feats["tde_avg_fit_chi2"] = jnp.where(n_c > 0, mu_c, jnp.nan)
    feats["tde_fit_quality_dispersion"] = jnp.where(n_c > 0, sd_c, jnp.nan)
    return feats
