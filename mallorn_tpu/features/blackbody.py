"""v64 blackbody-radius evolution features.

Re-design of reference src/features/blackbody_radius.py: Planck SED
temperature fits at 6 epochs (peak, +10/20/30/50/100 d) over the g/r/i
fluxes, pseudo-bolometric luminosity, R_bb ∝ sqrt(L)/T^2 and its
evolution (SNe expand, TDEs shrink).

Semantics (:40-433):
- epoch fluxes: mean of observations within ±5 d; else bracketing linear
  interpolation when the gap < 30 d (:190-233);
- global peak = flux-weighted average of g/r/i per-band peak times (:236-253);
- T fit: Planck B_lambda x amplitude, >= 2 positive bands, fluxes
  normalized by their median, bounds T in [3000, 1e5] (:76-131); the
  reference's 6-point initial-T grid search becomes 6 LM starts (the
  amplitude is optimized in log space — its 20-decade range is hostile to
  any linear parametrization);
- derived: dR/dt early/late/overall, monotonic-decrease flags, R ratios,
  R/T statistics, T drops/ratios, T constancy, R direction score (:310-430).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mallorn_tpu.data.packing import PackedLightcurves
from mallorn_tpu.features.base import FeatureSet
from mallorn_tpu.ops import masked as M
from mallorn_tpu.ops.lm import lm_fit_batched

H_PLANCK, C_LIGHT, K_BOLTZ = 6.626e-27, 2.998e10, 1.381e-16
FIT_WAVES = jnp.asarray([4825.0, 6222.0, 7545.0])  # g, r, i Angstrom
EPOCHS = (0.0, 10.0, 20.0, 30.0, 50.0, 100.0)
EPOCH_NAMES = ("peak", "10d", "20d", "30d", "50d", "100d")


def _planck(lam_A, T):
    lam_cm = lam_A * 1e-8
    x = jnp.clip(H_PLANCK * C_LIGHT / (lam_cm * K_BOLTZ * jnp.maximum(T, 1.0)),
                 1e-6, 500.0)
    return (2.0 * H_PLANCK * C_LIGHT ** 2 / lam_cm ** 5) / jnp.expm1(x)


def _bb_model(lam, theta):
    T, logA = theta
    return 10.0 ** logA * _planck(lam, T)


def _flux_at_epoch(t, f, mask, target):
    """[6] per-band epoch flux: window mean, else bracketed interp (<30 d)."""
    win = mask & (jnp.abs(t - target) <= 5.0)
    nwin = jnp.sum(win, axis=-1)
    win_mean = M.mean(f, win)

    before = mask & (t < target)
    after = mask & (t > target)
    t_b = M.mmax(t, before)
    t_a = M.mmin(t, after)
    ib = M.argmax(jnp.where(before, t, -1e30), before)
    ia = M.argmin(jnp.where(after, t, 1e30), after)
    f_b = jnp.take_along_axis(f, ib[..., None], -1)[..., 0]
    f_a = jnp.take_along_axis(f, ia[..., None], -1)[..., 0]
    ok_interp = jnp.any(before, -1) & jnp.any(after, -1) & (t_a - t_b < 30.0)
    w = (target - t_b) / jnp.maximum(t_a - t_b, 1e-10)
    interp = f_b + w * (f_a - f_b)

    out = jnp.where(nwin > 0, win_mean, jnp.where(ok_interp, interp, jnp.nan))
    return jnp.where(M.count(mask) > 0, out, jnp.nan)


def _fit_bb(gri_flux):
    """Batched (T, logA) Planck fits. gri_flux: [L, 3]. Returns (T, chi2red, n_valid)."""
    valid = jnp.isfinite(gri_flux) & (gri_flux > 0)
    nv = jnp.sum(valid, axis=1)
    med = M.median(gri_flux, valid)
    ok = (nv >= 2) & (med > 0)
    obs = jnp.where(valid, gri_flux / jnp.where(med > 0, med, 1.0)[:, None], 0.0)

    L = gri_flux.shape[0]
    lam = jnp.tile(FIT_WAVES, (L, 1))
    sigma = jnp.ones_like(obs)
    ones = jnp.ones(L)
    lb = jnp.stack([3000.0 * ones, -20.0 * ones], 1)
    ub = jnp.stack([100000.0 * ones, 0.0 * ones], 1)
    starts = jnp.stack([
        jnp.stack([T0 * ones, -10.0 * ones], 1)
        for T0 in (8000.0, 12000.0, 15000.0, 20000.0, 30000.0, 50000.0)
    ])
    res = lm_fit_batched(_bb_model, lam, obs, sigma, valid, starts, lb, ub,
                         n_iters=60)
    chi2 = res.cost
    chi2_red = chi2 / jnp.maximum(nv - 2, 1)
    ok = ok & res.valid
    return (jnp.where(ok, res.theta[:, 0], jnp.nan),
            jnp.where(ok, chi2_red, jnp.nan), nv)


def extract(packed: PackedLightcurves, meta=None, chunk_size: int = 2048) -> FeatureSet:
    N = packed.n_objects
    t, f, mask = packed.band_time, packed.band_flux, packed.band_mask

    # global peak: flux-weighted mean of g/r/i per-band argmax times
    pk_idx = jax.vmap(lambda fb, mb: M.argmax(fb, mb))(
        f[:, 1:4].reshape(N * 3, -1), mask[:, 1:4].reshape(N * 3, -1)).reshape(N, 3)
    pk_t = jnp.take_along_axis(t[:, 1:4].reshape(N, 3, -1), pk_idx[..., None], -1)[..., 0]
    pk_f = jnp.take_along_axis(f[:, 1:4].reshape(N, 3, -1), pk_idx[..., None], -1)[..., 0]
    has = jnp.sum(mask[:, 1:4], -1) > 0  # [N, 3]
    wsum = jnp.sum(jnp.where(has, pk_f, 0.0), 1)
    peak_time = jnp.sum(jnp.where(has, pk_t * pk_f, 0.0), 1) / jnp.where(wsum != 0, wsum, 1.0)
    have_peak = jnp.any(has, 1) & (wsum != 0)

    # epoch fluxes for g, r, i: [N, n_epochs, 3]
    def fluxes_for(packed_t, packed_f, packed_m, target):
        return jax.vmap(_flux_at_epoch)(packed_t, packed_f, packed_m, target)

    gri = []
    for dt in EPOCHS:
        fl = fluxes_for(t[:, 1:4], f[:, 1:4], mask[:, 1:4], peak_time + dt)  # [N,3]
        gri.append(fl)
    gri = jnp.stack(gri, axis=1)  # [N, E, 3]
    gri = jnp.where(have_peak[:, None, None], gri, jnp.nan)

    E = len(EPOCHS)
    T_fit, chi2, nv = _fit_bb(gri.reshape(N * E, 3))
    T_fit = T_fit.reshape(N, E)
    chi2 = chi2.reshape(N, E)

    # L proxy: mean of valid positive g/r/i(/z omitted: fit bands) fluxes
    lv = jnp.isfinite(gri) & (gri > 0)
    nlv = jnp.sum(lv, -1)
    L_proxy = jnp.sum(jnp.where(lv, gri, 0.0), -1) / jnp.maximum(nlv, 1)
    L_proxy = jnp.where((nlv >= 2) & ~jnp.isnan(T_fit), L_proxy, jnp.nan)
    R = jnp.where((L_proxy > 0) & (T_fit > 0),
                  jnp.sqrt(L_proxy) / (T_fit ** 2) * 1e8, jnp.nan)

    feats: FeatureSet = {}
    for ei, name in enumerate(EPOCH_NAMES):
        feats[f"T_{name}"] = T_fit[:, ei]
        feats[f"T_chi2_{name}"] = chi2[:, ei]
        feats[f"R_bb_{name}"] = R[:, ei]
        feats[f"L_proxy_{name}"] = L_proxy[:, ei]

    valid_e = ~jnp.isnan(R) & ~jnp.isnan(T_fit)  # [N, E]
    n_val = jnp.sum(valid_e, 1)
    ok2 = n_val >= 2
    ep = jnp.asarray(EPOCHS)

    def nanfit(x_col, y, m):
        s, _ = M.linfit(jnp.broadcast_to(x_col, y.shape), jnp.where(m, y, 0.0), m)
        return s

    early = valid_e & (ep <= 30.0)
    late = valid_e & (ep >= 30.0)
    s_early = nanfit(ep, R, early)
    s_late = nanfit(ep, R, late)
    s_all = nanfit(ep, R, valid_e)
    feats["dRdt_early"] = jnp.where(ok2 & (jnp.sum(early, 1) >= 2), s_early, jnp.nan)
    feats["R_increasing_early"] = jnp.where(
        ok2 & (jnp.sum(early, 1) >= 2), (s_early > 0).astype(jnp.float32), jnp.nan)
    feats["dRdt_late"] = jnp.where(ok2 & (jnp.sum(late, 1) >= 2), s_late, jnp.nan)
    feats["dRdt_overall"] = jnp.where(ok2, s_all, jnp.nan)
    feats["R_bb_trend_slope"] = feats["dRdt_overall"]

    # monotonic decrease over the COMPACTED valid sequence
    order = jnp.argsort(~valid_e, axis=1, stable=True)
    R_c = jnp.take_along_axis(R, order, 1)
    pos = jnp.arange(E)
    pairm = (pos[1:][None, :] < n_val[:, None])
    dR = R_c[:, 1:] - R_c[:, :-1]
    all_dec = jnp.all(jnp.where(pairm, dR < 0, True), 1)
    frac_dec = jnp.sum(jnp.where(pairm, (dR < 0).astype(jnp.float32), 0.0), 1) / jnp.maximum(jnp.sum(pairm, 1), 1)
    feats["R_monotonic_decrease"] = jnp.where(ok2, all_dec.astype(jnp.float32), jnp.nan)
    feats["R_frac_decreasing"] = jnp.where(ok2, frac_dec, jnp.nan)

    def ratio(a, b):
        okr = ~jnp.isnan(a) & ~jnp.isnan(b) & (b > 0)
        return jnp.where(ok2 & okr, a / jnp.where(okr, b, 1.0), jnp.nan)

    feats["R_ratio_peak_50d"] = ratio(R[:, 0], R[:, 4])
    feats["R_ratio_peak_100d"] = ratio(R[:, 0], R[:, 5])
    feats["R_ratio_10d_30d"] = ratio(R[:, 1], R[:, 3])

    R_mu = M.mean(R, valid_e)
    R_var = M.var(R, valid_e, 0)
    feats["R_bb_variance"] = jnp.where(ok2, R_var, jnp.nan)
    feats["R_bb_range"] = jnp.where(ok2, M.mmax(R, valid_e) - M.mmin(R, valid_e), jnp.nan)
    feats["R_bb_mean"] = jnp.where(ok2, R_mu, jnp.nan)
    feats["R_bb_std"] = jnp.where(ok2, jnp.sqrt(R_var), jnp.nan)
    first = R_c[:, 0]
    last = jnp.take_along_axis(R_c, jnp.maximum(n_val - 1, 0)[:, None], 1)[:, 0]
    feats["R_bb_rel_change"] = jnp.where(ok2, (last - first) / (first + 1e-10), jnp.nan)

    T_mu = M.mean(T_fit, valid_e)
    T_var = M.var(T_fit, valid_e, 0)
    feats["T_variance"] = jnp.where(ok2, T_var, jnp.nan)
    feats["T_std"] = jnp.where(ok2, jnp.sqrt(T_var), jnp.nan)
    feats["T_range"] = jnp.where(ok2, M.mmax(T_fit, valid_e) - M.mmin(T_fit, valid_e), jnp.nan)

    def t_pair(a, b, drop_name, ratio_name):
        okt = ok2 & ~jnp.isnan(a) & ~jnp.isnan(b)
        feats[drop_name] = jnp.where(okt, a - b, jnp.nan)
        feats[ratio_name] = jnp.where(okt, a / (b + 1.0), jnp.nan)

    t_pair(T_fit[:, 0], T_fit[:, 4], "T_drop_peak_50d", "T_ratio_peak_50d")
    t_pair(T_fit[:, 0], T_fit[:, 5], "T_drop_peak_100d", "T_ratio_peak_100d")

    feats["dTdt"] = jnp.where(ok2, nanfit(ep, T_fit, valid_e), jnp.nan)
    t_var_norm = T_var / (T_mu ** 2 + 1.0)
    feats["T_constancy"] = jnp.where(ok2, 1.0 / (t_var_norm + 0.01), jnp.nan)
    feats["R_direction_score"] = jnp.where(ok2, s_all / (R_mu + 1e-10), jnp.nan)
    return feats
