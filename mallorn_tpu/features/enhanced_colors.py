"""v47 enhanced colors: 4 pairs x 8 epochs windowed colors + dispersions +
a cross-color correlation.

Re-design of reference src/features/enhanced_colors.py:
- peak epoch from the g band argmax, falling back to r (:81-95);
- flux at epoch: observations within ±5 d, >= 2 required, linear
  interpolation with NaN outside the window subset's span (:22-57);
- per-pair dispersion/range/mean over >= 3 finite epoch colors (:146-155);
- gr-ri correlation pairs the k-th FINITE g-r color with the k-th finite
  r-i color positionally (the reference zips the filtered lists, not
  matching epochs — replicated exactly, :160-175).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M

OFFSETS = (0.0, 10.0, 20.0, 30.0, 50.0, 75.0, 100.0, 150.0)
PAIRS = ((0, 1, "ug"), (1, 2, "gr"), (2, 3, "ri"), (3, 4, "iz"))


def _flux_at(t, f, mask, target):
    """get_flux_at_time: ±5 d window, >= 2 points, linear interp, NaN
    outside the window subset's span."""
    win = mask & (t >= target - 5.0) & (t <= target + 5.0)
    nw = jnp.sum(win, axis=-1)
    v = M.interp_at(t, f, win, target, max_gap=jnp.inf)
    return jnp.where(nw >= 2, v, jnp.nan)


def _compact(vals):
    """Finite values moved to the front (stable), rest NaN."""
    finite = jnp.isfinite(vals)
    order = jnp.argsort(~finite, stable=True)
    return vals[order], jnp.sum(finite)


def _kernel(v: ObjectView) -> FeatureSet:
    feats: FeatureSet = {}
    t, f, mask = v.band_time, v.band_flux, v.band_mask
    nb = M.count(mask)

    g_peak = t[1][M.argmax(f[1], mask[1])]
    r_peak = t[2][M.argmax(f[2], mask[2])]
    peak = jnp.where(nb[1] > 0, g_peak, jnp.where(nb[2] > 0, r_peak, jnp.nan))

    colors = {}
    for off in OFFSETS:
        target = peak + off
        fl = _flux_at(t, f, mask, target)  # [6]
        for b1, b2, pname in PAIRS:
            ok = (fl[b1] > 0) & (fl[b2] > 0) & jnp.isfinite(fl[b1]) & jnp.isfinite(fl[b2])
            c = jnp.where(ok, -2.5 * jnp.log10(jnp.where(ok, fl[b1], 1.0)
                                               / jnp.where(ok, fl[b2], 1.0)), jnp.nan)
            feats[f"{pname}_color_{int(off)}d"] = c
            colors.setdefault(pname, []).append(c)

    for b1, b2, pname in PAIRS:
        cv = jnp.stack(colors[pname])
        m = jnp.isfinite(cv)
        n = jnp.sum(m)
        mu = jnp.sum(jnp.where(m, cv, 0.0)) / jnp.maximum(n, 1)
        sd = jnp.sqrt(jnp.sum(jnp.where(m, (cv - mu) ** 2, 0.0)) / jnp.maximum(n, 1))
        rng = M.mmax(cv, m) - M.mmin(cv, m)
        feats[f"{pname}_color_dispersion"] = jnp.where(n >= 3, sd, jnp.nan)
        feats[f"{pname}_color_range"] = jnp.where(n >= 3, rng, jnp.nan)
        feats[f"{pname}_color_mean"] = jnp.where(n >= 3, mu, jnp.nan)

    # positional pairing of the filtered finite lists (reference quirk)
    gr_c, n_gr = _compact(jnp.stack(colors["gr"]))
    ri_c, n_ri = _compact(jnp.stack(colors["ri"]))
    npair = jnp.minimum(n_gr, n_ri)
    idx = jnp.arange(len(OFFSETS))
    pm = idx < npair
    gx = jnp.where(pm, gr_c, 0.0)
    rx = jnp.where(pm, ri_c, 0.0)
    nf = jnp.maximum(npair, 1)
    gmu = jnp.sum(gx) / nf
    rmu = jnp.sum(rx) / nf
    cov = jnp.sum(jnp.where(pm, (gx - gmu) * (rx - rmu), 0.0))
    gsd = jnp.sqrt(jnp.sum(jnp.where(pm, (gx - gmu) ** 2, 0.0)))
    rsd = jnp.sqrt(jnp.sum(jnp.where(pm, (rx - rmu) ** 2, 0.0)))
    corr = cov / jnp.maximum(gsd * rsd, 1e-30)
    ok = (n_gr >= 2) & (n_ri >= 2) & (npair >= 3)
    feats["gr_ri_color_correlation"] = jnp.where(ok, corr, jnp.nan)
    return feats


extract = vmap_features(_kernel)
