"""v55 decline-model features: R^2 of 9 parametric decay models per band.

TPU re-design of reference scripts/train_v55_powerlaw.py:108-202 — the
9-model x 3-band x all-objects sweep (~270k scipy fits in the reference,
run serially and re-filtering the full DataFrame per call) becomes 9
batched LM solves over [N x 3] lanes.

Models (fit to post-peak data, t relative to peak):
  powerlaw_p:  A * max(t - t0, 0.1)^(-p)   p in {5/3, 1, 1.5, 2, 2.5, 3, 0.5}
  exponential: A * exp(-max(t - t0, 0)/tau)
  linear:      A - b * max(t - t0, 0)

Guards (reference :148-168): band < 5 points -> NaN; < 3 post-peak -> NaN;
infeasible p0 (scipy raises) -> NaN. Feature = R^2 = 1 - ss_res/ss_tot
(0 when ss_tot == 0). Fits are unweighted (sigma=None in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.data.packing import PackedLightcurves
from mallorn_tpu.features.base import FeatureSet
from mallorn_tpu.ops import masked as M
from mallorn_tpu.ops.lm import lm_fit_batched

BANDS = ((1, "g"), (2, "r"), (3, "i"))

POWERS = {"powerlaw_5_3": 5.0 / 3.0, "powerlaw_1": 1.0, "powerlaw_1_5": 1.5,
          "powerlaw_2": 2.0, "powerlaw_2_5": 2.5, "powerlaw_3": 3.0,
          "powerlaw_0_5": 0.5}
MODEL_NAMES = tuple(POWERS) + ("exponential", "linear")


def _make_power_model(p):
    def model(t, theta):
        A, t0 = theta
        return A * jnp.power(jnp.maximum(t - t0, 0.1), -p)
    return model


def _exp_model(t, theta):
    A, tau, t0 = theta
    return A * jnp.exp(-jnp.maximum(t - t0, 0.0) / tau)


def _linear_model(t, theta):
    A, b, t0 = theta
    return A - b * jnp.maximum(t - t0, 0.0)


def extract(packed: PackedLightcurves, meta=None, n_iters: int = 60) -> FeatureSet:
    N = packed.n_objects
    T = packed.band_time.shape[-1]

    # lanes = N x 3 optical bands
    t = packed.band_time[:, 1:4].reshape(N * 3, T)
    f = packed.band_flux[:, 1:4].reshape(N * 3, T)
    mask = packed.band_mask[:, 1:4].reshape(N * 3, T)

    n = M.count(mask)
    peak_idx = M.argmax(f, mask)
    pt = jnp.take_along_axis(t, peak_idx[:, None], 1)[:, 0]
    pf = jnp.take_along_axis(f, peak_idx[:, None], 1)[:, 0]

    post = mask & (t > pt[:, None])
    n_post = jnp.sum(post, axis=1)
    guard = (n >= 5) & (n_post >= 3)

    tp = jnp.where(post, t - pt[:, None], 0.0)  # t_post
    fp = jnp.where(post, f, 0.0)
    sigma = jnp.ones_like(fp)

    ss_tot = jnp.sum(jnp.where(post, (f - M.mean(f, post)[:, None]) ** 2, 0.0), 1)

    ones = jnp.ones_like(pf)
    feats: FeatureSet = {}
    results = {}

    def r2_of(model, theta0, lb, ub, feasible):
        res = lm_fit_batched(model, tp, fp, sigma, post, theta0, lb, ub,
                             n_iters=n_iters)
        pred = jnp.where(post, model(tp.T, tuple(res.theta.T)).T, 0.0)
        ss_res = jnp.sum(jnp.where(post, (fp - pred) ** 2, 0.0), 1)
        r2 = jnp.where(ss_tot > 0, 1.0 - ss_res / jnp.where(ss_tot > 0, ss_tot, 1.0), 0.0)
        ok = guard & feasible & res.valid
        return jnp.where(ok, r2, jnp.nan)

    # 2-param power laws: p0 = [peak_flux, 0], bounds ([0,-10],[1e6,10])
    theta0_2 = jnp.stack([pf, jnp.zeros_like(pf)], 1)
    lb_2 = jnp.stack([0.0 * ones, -10.0 * ones], 1)
    ub_2 = jnp.stack([1e6 * ones, 10.0 * ones], 1)
    feas_2 = (pf >= 0) & (pf <= 1e6)
    for name, p in POWERS.items():
        results[name] = r2_of(_make_power_model(p), theta0_2, lb_2, ub_2, feas_2)

    # exponential: p0 = [peak, 30, 0], bounds ([0,1,-10],[1e6,500,10])
    theta0_e = jnp.stack([pf, 30.0 * ones, jnp.zeros_like(pf)], 1)
    lb_e = jnp.stack([0.0 * ones, 1.0 * ones, -10.0 * ones], 1)
    ub_e = jnp.stack([1e6 * ones, 500.0 * ones, 10.0 * ones], 1)
    results["exponential"] = r2_of(_exp_model, theta0_e, lb_e, ub_e, feas_2)

    # linear: p0 = [peak, 1, 0], bounds ([0,0,-10],[1e6,100,10])
    theta0_l = jnp.stack([pf, 1.0 * ones, jnp.zeros_like(pf)], 1)
    lb_l = jnp.stack([0.0 * ones, 0.0 * ones, -10.0 * ones], 1)
    ub_l = jnp.stack([1e6 * ones, 100.0 * ones, 10.0 * ones], 1)
    results["linear"] = r2_of(_linear_model, theta0_l, lb_l, ub_l, feas_2)

    for pi, (_, bname) in enumerate(BANDS):
        for mname in MODEL_NAMES:
            feats[f"{bname}_{mname}_r2"] = results[mname].reshape(N, 3)[:, pi]
    return feats
