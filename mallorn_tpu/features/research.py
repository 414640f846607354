"""Research-literature features (the v115c additions): explicit power-law
decay quality, nuclear-transient proxies, color at peak, Mexican-hat power
spectra (MHPS), absolute luminosity.

Masked-kernel re-design of reference src/features/research_features.py:

- power-law block (:38-156): log-log polyfit on points > 10 d post-peak
  with positive flux (band >= 5 points, >= 4 post), deviations from -5/3
  and -5/12, residual std, approximate log-space chi^2 with clipped
  errors, fit_success flag, optical aggregates;
- nuclear proxies (:163-243): smoothness 1/(1+median rate/median err),
  concentration (peak/p10 with fallback), short/long variability ratio
  over 5-point windows with the reference's i+5 time-window quirk,
  combined score;
- color at peak (:250-327): nearest g/r (r/i) observations within 10 d of
  the r-band (fallback g) peak, plus peak->late (>50 d, <=5 d matched)
  color change;
- MHPS (:334-424): 1-day-grid linear interpolation (np.interp clamping),
  mean-removed, Ricker wavelets at 10/30/100 d scales with the reference's
  length rule min(5*scale, grid//2), power = sum(conv_same^2)/len,
  ratios and dominant scale;
- luminosity (:431-526): piecewise flat-LCDM D_L approximation, combined
  optical g/r/i rows, peak/amplitude/mean luminosity and log-space
  decline rate x100.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M

_BIG = 1.0e30
GRID_LEN = 1024  # 1-day grid buffer (spans beyond any LSST season window)
WAVELET_LEN = 512
H0, C_KM_S = 70.0, 299792.458
OMEGA_M, OMEGA_L = 0.3, 0.7
MHPS_SCALES = (10.0, 30.0, 100.0)


def _np_interp(grid, times, values, mask):
    """np.interp semantics on a masked sorted series: clamps at both ends."""
    t = jnp.where(mask, times, _BIG)
    idx = jnp.searchsorted(t, grid, side="right") - 1  # index of left point
    n = jnp.sum(mask)
    lo = jnp.clip(idx, 0, jnp.maximum(n - 1, 0))
    hi = jnp.clip(idx + 1, 0, jnp.maximum(n - 1, 0))
    t1, t2 = t[lo], t[hi]
    f1, f2 = values[lo], values[hi]
    dt = t2 - t1
    w = jnp.where(dt > 0, (grid - t1) / jnp.where(dt > 0, dt, 1.0), 0.0)
    w = jnp.clip(w, 0.0, 1.0)
    return f1 + w * (f2 - f1)


def _powerlaw_block(t, f, e, mask, nb):
    out = {}
    pk = M.argmax(f, mask)
    pt = jnp.take_along_axis(t, pk[..., None], -1)[..., 0]

    post = mask & (t > pt[..., None] + 10.0) & (f > 0)
    n_post = jnp.sum(post, -1)
    ok = (nb >= 5) & (n_post >= 4)

    dt = jnp.where(post, t - pt[..., None], 1.0)
    log_t = jnp.log10(jnp.maximum(dt, 1e-10))
    log_f = jnp.log10(jnp.maximum(jnp.where(post, f, 1.0), 1e-10))
    slope, intercept = M.linfit(log_t, log_f, post)
    resid = jnp.where(post, log_f - (slope[..., None] * log_t + intercept[..., None]), 0.0)
    resid_std = M.std(resid, post, 0)

    log_errs = jnp.where(post, e, 1.0) / (jnp.where(post, f, 1.0) * jnp.log(10.0) + 1e-10)
    log_errs = jnp.clip(log_errs, 0.01, 1.0)
    chi2 = jnp.sum(jnp.where(post, (resid / log_errs) ** 2, 0.0), -1)
    red_chi2 = chi2 / jnp.maximum(n_post - 2, 1)

    out["powerlaw_alpha"] = jnp.where(ok, slope, jnp.nan)
    out["powerlaw_alpha_deviation_53"] = jnp.where(ok, jnp.abs(slope + 5.0 / 3.0), jnp.nan)
    out["powerlaw_alpha_deviation_512"] = jnp.where(ok, jnp.abs(slope + 5.0 / 12.0), jnp.nan)
    out["powerlaw_chi2"] = jnp.where(ok & (n_post > 2), red_chi2, jnp.nan)
    out["powerlaw_residual_std"] = jnp.where(ok, resid_std, jnp.nan)
    # success flag: NaN when band < 5 points, else 0/1 (reference :64,112,128-132)
    succ = jnp.where(ok, 1.0, 0.0)
    out["powerlaw_fit_success"] = jnp.where(nb >= 5, succ, jnp.nan)
    return out


def _ricker(scale, length_f, buf_len):
    """Ricker wavelet in a fixed buffer, masked to ``length_f`` points,
    replicating np.linspace(-L//2, L//2, L)."""
    k = jnp.arange(buf_len, dtype=jnp.float32)
    L = length_f
    # np.linspace(-L//2, L//2, L): python's -L//2 floors toward -inf, so the
    # lower end is -ceil(L/2) (asymmetric for odd L) — replicate exactly
    lo = -jnp.ceil(L / 2.0)
    hi = jnp.floor(L / 2.0)
    step = jnp.where(L > 1, (hi - lo) / jnp.maximum(L - 1.0, 1.0), 0.0)
    tt = lo + k * step
    nt = tt / scale
    w = (1.0 - nt * nt) * jnp.exp(-nt * nt / 2.0)
    wmask = k < L
    w = jnp.where(wmask, w, 0.0)
    energy = jnp.sqrt(jnp.sum(w * w))
    return w / jnp.maximum(energy, 1e-20), wmask


def _conv_same(f, w, g_len, w_len, buf):
    """scipy convolve(f, w, 'same') for masked fixed buffers via FFT."""
    n_fft = 2 * buf
    F = jnp.fft.rfft(f, n_fft)
    W = jnp.fft.rfft(w, n_fft)
    full = jnp.fft.irfft(F * W, n_fft)
    start = jnp.floor((w_len - 1.0) / 2.0).astype(jnp.int32)
    idx = start + jnp.arange(buf)
    out = full[jnp.clip(idx, 0, n_fft - 1)]
    return jnp.where(jnp.arange(buf) < g_len, out, 0.0)


def _mhps_block(t, f, mask, nb):
    out = {f"mhps_{int(s)}d": jnp.nan * jnp.zeros(()) for s in MHPS_SCALES}
    out["mhps_10_100_ratio"] = jnp.nan
    out["mhps_30_100_ratio"] = jnp.nan
    out["mhps_dominant_scale"] = jnp.nan

    t0 = M.mmin(t, mask)
    t1 = M.mmax(t, mask)
    span = t1 - t0
    ok = (nb >= 20) & (span >= 50.0)

    # regular 1-day grid np.arange(t0, t1, 1) -> ceil(span) points
    g_len = jnp.ceil(span).astype(jnp.int32)
    g_len = jnp.clip(g_len, 1, GRID_LEN)
    grid = t0 + jnp.arange(GRID_LEN, dtype=jnp.float32)
    fr = _np_interp(grid, t, f, mask)
    gmask = jnp.arange(GRID_LEN) < g_len
    mu = jnp.sum(jnp.where(gmask, fr, 0.0)) / jnp.maximum(g_len, 1)
    fr = jnp.where(gmask, fr - mu, 0.0)

    powers = {}
    for s in MHPS_SCALES:
        w_len = jnp.minimum(5.0 * s, jnp.floor(g_len / 2.0)).astype(jnp.int32).astype(jnp.float32)
        valid = w_len >= 5
        w, _ = _ricker(s, w_len, WAVELET_LEN)
        conv = _conv_same(fr, w, g_len, w_len, GRID_LEN)
        power = jnp.sum(conv * conv) / jnp.maximum(g_len, 1)
        p = jnp.where(ok & valid, power, jnp.nan)
        powers[s] = p
        out[f"mhps_{int(s)}d"] = p

    p10, p30, p100 = powers[10.0], powers[30.0], powers[100.0]
    out["mhps_10_100_ratio"] = jnp.where(
        ~jnp.isnan(p10) & ~jnp.isnan(p100) & (p100 > 0), p10 / p100, jnp.nan)
    out["mhps_30_100_ratio"] = jnp.where(
        ~jnp.isnan(p30) & ~jnp.isnan(p100) & (p100 > 0), p30 / p100, jnp.nan)
    stacked = jnp.stack([jnp.where(jnp.isnan(powers[s]), -jnp.inf, powers[s])
                         for s in MHPS_SCALES])
    any_p = jnp.any(jnp.isfinite(stacked))
    dom = jnp.asarray(MHPS_SCALES)[jnp.argmax(stacked)]
    out["mhps_dominant_scale"] = jnp.where(any_p, dom, jnp.nan)
    return out


def _lum_distance(z):
    dl_low = (C_KM_S / H0) * z * (1.0 + z / 2.0)
    q0 = 0.5 * OMEGA_M - OMEGA_L
    dl_mid = (C_KM_S / H0) * z * (1.0 + 0.5 * (1.0 - q0) * z)
    dl = jnp.where(z < 0.1, dl_low, dl_mid)
    return jnp.where((z > 0) & ~jnp.isnan(z), dl, jnp.nan)


def _kernel(v: ObjectView, z: jnp.ndarray) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, e, mask = v.band_time, v.band_flux, v.band_err, v.band_mask
    nb = M.count(mask)

    # 1. power-law fit quality for g, r, i + optical aggregates
    pl = _powerlaw_block(t, f, e, mask, nb)
    for bi, band in ((1, "g"), (2, "r"), (3, "i")):
        for key, val in pl.items():
            # band < 5 points -> NaN for every key incl. fit_success (:128-132)
            feats[f"{band}_{key}"] = jnp.where(nb[bi] >= 5, val[bi], jnp.nan)
    alphas = jnp.stack([feats["g_powerlaw_alpha"], feats["r_powerlaw_alpha"],
                        feats["i_powerlaw_alpha"]])
    am = ~jnp.isnan(alphas)
    na = jnp.sum(am)
    mu = jnp.sum(jnp.where(am, alphas, 0.0)) / jnp.maximum(na, 1)
    sd = jnp.sqrt(jnp.sum(jnp.where(am, (alphas - mu) ** 2, 0.0)) / jnp.maximum(na, 1))
    dev = jnp.sum(jnp.where(am, jnp.abs(alphas + 5.0 / 3.0), 0.0)) / jnp.maximum(na, 1)
    feats["optical_mean_powerlaw_alpha"] = jnp.where(na >= 1, mu, jnp.nan)
    feats["optical_std_powerlaw_alpha"] = jnp.where(na >= 2, sd, jnp.nan)
    feats["optical_mean_deviation_53"] = jnp.where(na >= 1, dev, jnp.nan)

    # 2. nuclear proxies (r band, >= 10 points)
    tr, fr_, er, mr = t[2], f[2], e[2], mask[2]
    nr = nb[2]
    ok10 = nr >= 10
    df = jnp.abs(fr_[1:] - fr_[:-1])
    dt = tr[1:] - tr[:-1]
    pairm = mr[1:] & mr[:-1]
    rate = jnp.where(pairm, df / (dt + 0.1), 0.0)
    med_rate = M.median(rate, pairm)
    med_err = M.median(er, mr)
    smooth = 1.0 / (1.0 + med_rate / jnp.where(med_err > 0, med_err, 1.0))
    feats["nuclear_smoothness"] = jnp.where(ok10 & (med_err > 0), smooth, jnp.nan)

    pk = M.mmax(fr_, mr)
    base = M.quantile(fr_, mr, 0.10)
    med_abs = M.median(jnp.abs(fr_) + 1.0, mr)
    conc = jnp.where(base > 0, pk / jnp.where(base > 0, base, 1.0),
                     jnp.where(pk > 0, pk / med_abs, jnp.nan))
    feats["nuclear_concentration"] = jnp.where(ok10, conc, jnp.nan)

    # variability ratio: 5-point windows, reference's i+5 time-gate quirk
    T = fr_.shape[0]
    ok20 = nr >= 20

    def window_std(i):
        w = jax.lax.dynamic_slice(fr_, (i,), (5,))
        wm = jax.lax.dynamic_slice(mr, (i,), (5,))
        n = jnp.sum(wm)
        mu = jnp.sum(jnp.where(wm, w, 0.0)) / jnp.maximum(n, 1)
        return jnp.sqrt(jnp.sum(jnp.where(wm, (w - mu) ** 2, 0.0)) / jnp.maximum(n, 1))

    idxs = jnp.arange(max(T - 5, 1))
    in_range = (idxs + 5 < nr) & (idxs < nr - 5)
    t_i5 = tr[jnp.clip(idxs + 5, 0, T - 1)]
    gate = in_range & (t_i5 - tr[jnp.clip(idxs, 0, T - 1)] < 15.0)
    stds = jax.vmap(window_std)(jnp.clip(idxs, 0, max(T - 5, 0)))
    n_w = jnp.sum(gate)
    short = jnp.sum(jnp.where(gate, stds, 0.0)) / jnp.maximum(n_w, 1)
    long_var = M.std(fr_, mr, 0)
    vr = short / jnp.where(long_var > 0, long_var, 1.0)
    feats["nuclear_variability_ratio"] = jnp.where(
        ok10 & ok20 & (n_w > 0) & (long_var > 0), vr, jnp.nan)

    s1, s2v, s3v = (feats["nuclear_smoothness"],
                    jnp.minimum(1.0, feats["nuclear_concentration"] / 100.0),
                    1.0 - jnp.minimum(1.0, feats["nuclear_variability_ratio"]))
    parts = jnp.stack([s1, s2v, s3v])
    pm = ~jnp.isnan(parts)
    np_ = jnp.sum(pm)
    score = jnp.sum(jnp.where(pm, parts, 0.0)) / jnp.maximum(np_, 1)
    feats["nuclear_position_score"] = jnp.where(np_ > 0, score, jnp.nan)

    # 3. color at peak: r-band (>=3) peak, else g (>=3)
    r_ok = nb[2] >= 3
    g_ok = nb[1] >= 3
    peak_r = t[2][M.argmax(f[2], mask[2])]
    peak_g = t[1][M.argmax(f[1], mask[1])]
    peak_time = jnp.where(r_ok, peak_r, peak_g)
    have_peak = r_ok | g_ok

    for b1, b2, pname in ((1, 2, "g_r"), (2, 3, "r_i")):
        both = (nb[b1] >= 2) & (nb[b2] >= 2)
        f1 = M.value_at_nearest(t[b1], f[b1], mask[b1] & (jnp.abs(t[b1] - peak_time) < 10.0),
                                peak_time, 10.0)
        f2 = M.value_at_nearest(t[b2], f[b2], mask[b2] & (jnp.abs(t[b2] - peak_time) < 10.0),
                                peak_time, 10.0)
        okc = have_peak & both & (f1 > 0) & (f2 > 0)
        cap = jnp.where(okc, -2.5 * jnp.log10(jnp.where(okc, f1, 1.0)
                                              / jnp.where(okc, f2, 1.0)), jnp.nan)
        feats[f"{pname}_color_at_peak"] = cap

        # late colors: band1 rows > peak+50 matched to band2 late within 5 d
        late1 = mask[b1] & (t[b1] > peak_time + 50.0)
        late2 = mask[b2] & (t[b2] > peak_time + 50.0)
        d = jnp.abs(t[b2][None, :] - t[b1][:, None])
        d = jnp.where(late2[None, :], d, _BIG)
        j = jnp.argmin(d, axis=1)
        dmin = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
        f2l = f[b2][j]
        pairs = late1 & (dmin < 5.0) & (f[b1] > 0) & (f2l > 0)
        cl = -2.5 * jnp.log10(jnp.where(pairs, f[b1], 1.0) / jnp.where(pairs, f2l, 1.0))
        ncl = jnp.sum(pairs)
        mean_cl = jnp.sum(jnp.where(pairs, cl, 0.0)) / jnp.maximum(ncl, 1)
        feats[f"{pname}_color_peak_to_late"] = jnp.where(
            okc & (ncl > 0), mean_cl - cap, jnp.nan)

    # 4. MHPS on r band
    feats.update(_mhps_block(t[2], f[2], mask[2], nb[2]))

    # 5. luminosity (combined optical g/r/i rows of the all-band view)
    dl = _lum_distance(z)
    opt = v.all_mask & (v.all_band >= 1) & (v.all_band <= 3)
    n_opt = jnp.sum(opt)
    ok_lum = ~jnp.isnan(dl) & (n_opt >= 5)
    lum = v.all_flux * dl * dl
    feats["luminosity_distance_mpc"] = jnp.where(~jnp.isnan(dl), dl, jnp.nan)
    feats["peak_luminosity"] = jnp.where(ok_lum, M.mmax(lum, opt), jnp.nan)
    feats["luminosity_amplitude"] = jnp.where(
        ok_lum, M.mmax(lum, opt) - M.quantile(lum, opt, 0.10), jnp.nan)
    feats["mean_luminosity"] = jnp.where(ok_lum, M.mean(lum, opt), jnp.nan)

    pos = jnp.cumsum(opt) - 1
    pk_i = M.argmax(lum, opt)
    pk_pos = pos[pk_i]
    post = opt & (pos >= pk_pos)
    n_post = jnp.sum(post)
    all_pos = jnp.all(jnp.where(post, lum, 1.0) > 0)
    dtp = jnp.where(post, v.all_time, 0.0)
    log_lum = jnp.log10(jnp.maximum(jnp.where(post, lum, 1.0), 1e-30))
    dt_std = M.std(dtp, post, 0)
    slope, _ = M.linfit(dtp, log_lum, post)
    decline_ok = ok_lum & (pk_pos < n_opt - 5) & (n_post >= 3) & all_pos & (dt_std > 0)
    feats["luminosity_decline_rate"] = jnp.where(decline_ok, slope * 100.0, jnp.nan)

    return feats


_extract = vmap_features(_kernel)


def extract(packed, meta) -> FeatureSet:
    z = jnp.asarray(meta.z) if meta is not None else jnp.full(packed.n_objects, jnp.nan)
    return _extract(packed, z)
