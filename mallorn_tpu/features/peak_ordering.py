"""Cross-band peak-ordering features (the v56 AGN/TDE separator).

Masked-kernel re-design of the reference's script-level extractor
(reference: scripts/train_v56_agn_peak_ordering.py:130-199): TDEs tend
to peak blue-first with long inter-band delays; AGN flares show no
consistent ordering. Semantics replicated exactly:

- per-band peak time: bands with >= 3 points; the peak is the first
  max-flux point in time order (:141-152 sorts by time then argmax);
- g_to_r_peak_delay = peak_t[r] - peak_t[g]; u_to_i analogous, NaN
  unless both bands valid (:156-165);
- blue_to_red_delay = min(peak_t[z,y]) - min(peak_t[u,g]) over the
  valid bands of each side; is_blue_first = 1 if blue < red else 0,
  NaN when either side has no valid band (:168-176);
- first_peak_{band} one-hot / g_peaks_last / peak_time_spread need
  >= 2 valid bands; ties in peak time resolve by band order for the
  first band and by REVERSE band order for the last (the reference's
  stable sort keeps equal keys in u..y order, so its [0] is the
  lowest-index tied band and its [-1] the highest) (:179-199).
"""

from __future__ import annotations

import jax.numpy as jnp

from mallorn_tpu.features.base import FeatureSet, ObjectView, vmap_features
from mallorn_tpu.ops import masked as M
from mallorn_tpu.utils.constants import LSST_BANDS

_BIG = 1.0e30


def _kernel(v: ObjectView) -> FeatureSet:
    t, f, m = v.band_time, v.band_flux, v.band_mask  # [6, T]
    ok = M.count(m) >= 3  # [6]

    fmax = M.mmax(f, m)  # [6]
    at_peak = m & (f == fmax[:, None])
    # earliest time among max-flux points == sort-by-time-then-argmax
    pt = jnp.min(jnp.where(at_peak, t, _BIG), axis=-1)  # [6]
    pt = jnp.where(ok, pt, jnp.nan)

    feats: FeatureSet = {}
    # band indices: LSST_BANDS == (u, g, r, i, z, y)
    feats["g_to_r_peak_delay"] = pt[2] - pt[1]
    feats["u_to_i_peak_delay"] = pt[3] - pt[0]

    def _nanmin2(a, b):
        both = jnp.isnan(a) & jnp.isnan(b)
        lo = jnp.minimum(jnp.nan_to_num(a, nan=_BIG),
                         jnp.nan_to_num(b, nan=_BIG))
        return jnp.where(both, jnp.nan, lo)

    blue = _nanmin2(pt[0], pt[1])
    red = _nanmin2(pt[4], pt[5])
    feats["blue_to_red_delay"] = red - blue
    feats["is_blue_first"] = jnp.where(
        jnp.isnan(blue) | jnp.isnan(red), jnp.nan,
        (blue < red).astype(jnp.float32))

    valid = ~jnp.isnan(pt)
    nv = jnp.sum(valid)
    enough = nv >= 2
    first_b = jnp.argmin(jnp.where(valid, pt, _BIG))  # ties -> lowest index
    # ties -> HIGHEST index (the reference's stable sort puts the
    # highest-index tied band last): argmax over the reversed axis
    last_b = 5 - jnp.argmax(jnp.where(valid, pt, -_BIG)[::-1])
    for bi, band in enumerate(LSST_BANDS):
        feats[f"first_peak_{band}"] = jnp.where(
            enough, (first_b == bi).astype(jnp.float32), jnp.nan)
    feats["g_peaks_last"] = jnp.where(
        enough, (last_b == 1).astype(jnp.float32), jnp.nan)
    spread = (jnp.max(jnp.where(valid, pt, -_BIG))
              - jnp.min(jnp.where(valid, pt, _BIG)))
    feats["peak_time_spread"] = jnp.where(enough, spread, jnp.nan)
    return feats


extract = vmap_features(_kernel)
