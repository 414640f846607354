"""v18 per-band 1D GP features (RBF x Constant + White).

Re-design of reference src/features/gaussian_process.py: the per-(object,
band) sklearn GaussianProcessRegressor fits (~61k serial Cython
optimizations) become batched lanes of an RBF marginal-likelihood Adam
optimization — same model family as ops/gp but with the sklearn kernel:

  k(t, t') = amp^2 * exp(-(t-t')^2 / (2 l^2)) + noise^2 * I,
plus the fixed observational alpha = err^2 on the diagonal.

Semantics preserved (:29-131): >= 5 valid (finite, err > 0) points;
time normalized to [0, 1]; flux standardized by its std; hyperparameters
optimized in log space within the sklearn bounds (amp^2 in [0.01, 100],
l in [0.01, 2], noise^2 in [1e-5, 10]); features reported in original
units (length scale x t_range days, amplitude/noise x f_std); cross-band
length-scale ratios and g/r/i aggregates (:210-250).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mallorn_tpu.data.packing import PackedLightcurves
from mallorn_tpu.features.base import FeatureSet
from mallorn_tpu.ops import masked as M
from mallorn_tpu.utils.constants import LSST_BANDS, N_BANDS

# log-space bounds matching the sklearn kernel definition
_LOG_BOUNDS = {
    "log_amp2": (jnp.log(0.01), jnp.log(100.0)),
    "log_l": (jnp.log(0.01), jnp.log(2.0)),
    "log_noise2": (jnp.log(1e-5), jnp.log(10.0)),
}


def _nll(params, t, y, alpha, mask):
    log_amp2, log_l, log_noise2 = params
    n = jnp.sum(mask)
    d2 = (t[:, None] - t[None, :]) ** 2
    K = jnp.exp(log_amp2) * jnp.exp(-0.5 * d2 / jnp.exp(2.0 * log_l))
    K = jnp.where(mask[:, None] & mask[None, :], K, 0.0)
    diag = jnp.where(mask, jnp.exp(log_noise2) + alpha + 1e-8, 1.0)
    K = K + jnp.diag(diag)
    L = jnp.linalg.cholesky(K)
    r = jnp.where(mask, y, 0.0)
    a = jax.scipy.linalg.cho_solve((L, True), r)
    logdet = 2.0 * jnp.sum(jnp.where(mask, jnp.log(jnp.diagonal(L)), 0.0))
    return 0.5 * (r @ a + logdet + n * jnp.log(2.0 * jnp.pi))


def _fit_lane(t, y, alpha, mask, n_steps, lr=0.5, lr_final=0.02):
    p0 = jnp.array([jnp.log(1.0), jnp.log(0.2), jnp.log(0.1)])
    lo = jnp.array([b[0] for b in _LOG_BOUNDS.values()])
    hi = jnp.array([b[1] for b in _LOG_BOUNDS.values()])

    grad_fn = jax.value_and_grad(_nll)

    def step(carry, _):
        p, m, v, i = carry
        lr_i = lr_final + 0.5 * (lr - lr_final) * (1.0 + jnp.cos(jnp.pi * i / n_steps))
        nll, g = grad_fn(p, t, y, alpha, mask)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        p = p - lr_i * (m / (1 - 0.9 ** (i + 1))) / (jnp.sqrt(v / (1 - 0.999 ** (i + 1))) + 1e-8)
        p = jnp.clip(p, lo, hi)
        return (p, m, v, i + 1), nll

    (p, _, _, _), _ = jax.lax.scan(
        step, (p0, jnp.zeros(3), jnp.zeros(3), jnp.asarray(0)), None,
        length=n_steps)
    final = _nll(p, t, y, alpha, mask)
    return p, -final


def extract(packed: PackedLightcurves, meta=None, n_steps: int = 150) -> FeatureSet:
    N = packed.n_objects
    T = packed.band_time.shape[-1]
    t = packed.band_time.reshape(N * N_BANDS, T)
    f = packed.band_flux.reshape(N * N_BANDS, T)
    e = packed.band_err.reshape(N * N_BANDS, T)
    mask = packed.band_mask.reshape(N * N_BANDS, T)

    use = mask & jnp.isfinite(f) & jnp.isfinite(e) & (e > 0)
    n = jnp.sum(use, axis=1)
    t0 = M.mmin(t, use)
    t1 = M.mmax(t, use)
    t_range = t1 - t0
    ok = (n >= 5) & (t_range > 0)

    tn = jnp.where(use, (t - t0[:, None]) / jnp.where(t_range > 0, t_range, 1.0)[:, None], 0.0)
    f_mu = M.mean(f, use)
    f_sd = M.std(f, use, 0)
    f_sd = jnp.where(f_sd > 0, f_sd, 1.0)
    yn = jnp.where(use, (f - f_mu[:, None]) / f_sd[:, None], 0.0)
    alpha = jnp.where(use, jnp.maximum((e / f_sd[:, None]) ** 2, 1e-10), 0.0)

    params, ll = jax.jit(jax.vmap(
        lambda a, b, c, d: _fit_lane(a, b, c, d, n_steps)))(tn, yn, alpha, use)
    ok = ok & jnp.isfinite(ll)

    amp = jnp.sqrt(jnp.exp(params[:, 0])) * f_sd
    ls_days = jnp.exp(params[:, 1]) * t_range
    noise = jnp.sqrt(jnp.exp(params[:, 2])) * f_sd

    per = {
        "gp_length_scale": jnp.where(ok, ls_days, jnp.nan).reshape(N, N_BANDS),
        "gp_amplitude": jnp.where(ok, amp, jnp.nan).reshape(N, N_BANDS),
        "gp_noise": jnp.where(ok, noise, jnp.nan).reshape(N, N_BANDS),
        "gp_log_likelihood": jnp.where(ok, ll, jnp.nan).reshape(N, N_BANDS),
    }

    feats: FeatureSet = {}
    for bi, band in enumerate(LSST_BANDS):
        for key, val in per.items():
            feats[f"{band}_{key}"] = val[:, bi]

    ls = per["gp_length_scale"]
    for b1, b2, pname in ((1, 2, "gr"), (2, 3, "ri")):
        okr = ~jnp.isnan(ls[:, b1]) & ~jnp.isnan(ls[:, b2]) & (ls[:, b2] > 0)
        feats[f"gp_ls_ratio_{pname}"] = jnp.where(
            okr, ls[:, b1] / jnp.where(okr, ls[:, b2], 1.0), jnp.nan)

    opt = ls[:, 1:4]
    m = ~jnp.isnan(opt)
    nv = jnp.sum(m, axis=1)
    mu = jnp.sum(jnp.where(m, opt, 0.0), 1) / jnp.maximum(nv, 1)
    sd = jnp.sqrt(jnp.sum(jnp.where(m, (opt - mu[:, None]) ** 2, 0.0), 1) / jnp.maximum(nv, 1))
    feats["gp_mean_length_scale"] = jnp.where(nv > 0, mu, jnp.nan)
    feats["gp_std_length_scale"] = jnp.where(nv > 0, jnp.where(nv > 1, sd, 0.0), jnp.nan)

    av = per["gp_amplitude"][:, 1:4]
    am = ~jnp.isnan(av)
    na = jnp.sum(am, axis=1)
    feats["gp_mean_amplitude"] = jnp.where(
        na > 0, jnp.sum(jnp.where(am, av, 0.0), 1) / jnp.maximum(na, 1), jnp.nan)
    return feats
