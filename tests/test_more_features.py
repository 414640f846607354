"""Parity tests for the wider feature-module surface: time_to_decline,
fourier, enhanced_colors, high_snr, interactions, categorical."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_feature_parity import assert_parity


@requires_reference
def test_time_to_decline_parity(small_dataset, ref_src):
    from features.time_to_decline import extract_time_to_decline_single
    import pandas as pd
    from mallorn_tpu.features import time_to_decline
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_time_to_decline_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = time_to_decline.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_fourier_parity(small_dataset, ref_src):
    from features.fourier_features import extract_fourier_features_single_band
    import pandas as pd
    from mallorn_tpu.features import fourier
    from tests.oracles.frames import to_reference_frames
    from mallorn_tpu.utils.constants import LSST_BANDS

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    rows = []
    for oid in meta.object_ids:
        sub = lc[lc["object_id"] == oid]
        r = {"object_id": oid}
        for band in LSST_BANDS:
            b = sub[sub["Filter"] == band].sort_values("Time (MJD)")
            r.update(extract_fourier_features_single_band(
                b["Time (MJD)"].to_numpy(), b["Flux"].to_numpy(), band))
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = fourier.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_enhanced_colors_parity(small_dataset, ref_src):
    from features.enhanced_colors import extract_enhanced_colors_single
    import pandas as pd
    from mallorn_tpu.features import enhanced_colors
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_enhanced_colors_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = enhanced_colors.extract(packed)
    assert_parity(ours, ref, meta)


@requires_reference
def test_high_snr_parity(small_dataset, ref_src):
    from features.high_snr_physics import extract_high_snr_features_single
    import pandas as pd
    from mallorn_tpu.features import high_snr
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    grouped = {o: g for o, g in lc.groupby("object_id")}
    rows = []
    for oid in meta.object_ids:
        r = extract_high_snr_features_single(grouped[oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = high_snr.extract(packed)
    assert_parity(ours, ref, meta)


def test_interactions_and_categorical(small_dataset):
    from mallorn_tpu.features import categorical, interactions, statistical
    from mallorn_tpu.features import colors as colors_mod

    from mallorn_tpu.features import shape as shape_mod

    packed, meta, _ = small_dataset
    feats = {k: np.asarray(v) for k, v in
             statistical.extract(packed, meta).items()}
    feats.update({k: np.asarray(v) for k, v in
                  colors_mod.extract(packed).items()})
    feats.update({k: np.asarray(v) for k, v in
                  shape_mod.extract(packed).items()})

    inter = interactions.create_physics_interactions(feats)
    assert "temp_cooling_ratio" not in inter  # needs physics features
    assert "r_skew_x_std" in inter and "rise_ratio_g_r" in inter
    y = meta.target
    top = interactions.select_top_interactions(
        inter, y, top_k=10, min_samples=20)
    assert len(top) <= 10

    cats, names = categorical.add_categorical_features(feats)
    assert "z_category" in names and "brightness_category" in names
    for n in names:
        assert set(np.unique(cats[n])) <= {0, 1, 2, 3}


def test_peak_ordering_parity(small_dataset):
    """peak_ordering vs an inline NumPy oracle implementing the
    reference's per-object algorithm verbatim
    (reference: scripts/train_v56_agn_peak_ordering.py:130-199)."""
    import pandas as pd
    from mallorn_tpu.features import peak_ordering
    from mallorn_tpu.utils.constants import LSST_BANDS
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)

    def oracle(sub):
        bands = list(LSST_BANDS)
        peak_times = {}
        for band in bands:
            b = sub[sub["Filter"] == band].sort_values("Time (MJD)")
            if len(b) < 3:
                peak_times[band] = np.nan
                continue
            tt = b["Time (MJD)"].to_numpy()
            ff = b["Flux"].to_numpy()
            peak_times[band] = tt[int(np.argmax(ff))]

        r = {}
        gp, rp = peak_times["g"], peak_times["r"]
        r["g_to_r_peak_delay"] = (rp - gp if not (np.isnan(gp) or np.isnan(rp))
                                  else np.nan)
        up, ip = peak_times["u"], peak_times["i"]
        r["u_to_i_peak_delay"] = (ip - up if not (np.isnan(up) or np.isnan(ip))
                                  else np.nan)
        blue = [peak_times[b] for b in ("u", "g") if not np.isnan(peak_times[b])]
        red = [peak_times[b] for b in ("z", "y") if not np.isnan(peak_times[b])]
        if blue and red:
            r["blue_to_red_delay"] = min(red) - min(blue)
            r["is_blue_first"] = 1.0 if min(blue) < min(red) else 0.0
        else:
            r["blue_to_red_delay"] = np.nan
            r["is_blue_first"] = np.nan
        valid = [(b, t) for b, t in peak_times.items() if not np.isnan(t)]
        if len(valid) >= 2:
            s = sorted(valid, key=lambda x: x[1])
            for band in bands:
                r[f"first_peak_{band}"] = 1.0 if s[0][0] == band else 0.0
            r["g_peaks_last"] = 1.0 if s[-1][0] == "g" else 0.0
            r["peak_time_spread"] = s[-1][1] - s[0][1]
        else:
            for band in bands:
                r[f"first_peak_{band}"] = np.nan
            r["g_peaks_last"] = np.nan
            r["peak_time_spread"] = np.nan
        return r

    rows = []
    for oid in meta.object_ids:
        r = oracle(lc[lc["object_id"] == oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = peak_ordering.extract(packed)
    assert_parity(ours, ref, meta)


def test_peak_ordering_tie_breaks():
    """Equal peak times across bands: first_peak goes to the lowest band
    index, last (g_peaks_last) to the highest — the reference's stable
    sort keeps equal keys in u..y order (script line 182)."""
    from mallorn_tpu.data.packing import pack_lightcurves
    from mallorn_tpu.features import peak_ordering

    # one object: bands u, g, r each with 3 points peaking at t=10.0
    times, fluxes, bands = [], [], []
    for bi in (0, 1, 2):  # u, g, r
        times += [0.0, 10.0, 20.0]
        fluxes += [1.0, 5.0, 2.0]
        bands += [bi] * 3
    n = len(times)
    packed = pack_lightcurves(np.zeros(n, np.int64), np.asarray(times),
                              np.asarray(fluxes), np.ones(n),
                              np.asarray(bands, np.int64), 1)
    out = peak_ordering.extract(packed)
    assert float(out["first_peak_u"][0]) == 1.0
    assert float(out["first_peak_g"][0]) == 0.0
    # last tied band is r (highest index) -> g does NOT peak last
    assert float(out["g_peaks_last"][0]) == 0.0
    assert float(out["peak_time_spread"][0]) == 0.0
    assert float(out["g_to_r_peak_delay"][0]) == 0.0


def test_fwhm_parity(small_dataset):
    """fwhm vs an inline NumPy oracle implementing the reference's
    per-object algorithm verbatim
    (reference: scripts/train_v58_fwhm.py:37-180)."""
    import pandas as pd
    from mallorn_tpu.features import fwhm as fwhm_mod
    from mallorn_tpu.utils.constants import LSST_BANDS
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)

    def oracle(sub):
        bands = list(LSST_BANDS)
        r = {}
        band_fwhm, asyms = {}, []
        for band in bands:
            b = sub[sub["Filter"] == band].sort_values("Time (MJD)")
            names = (f"{band}_rise_hwhm", f"{band}_fall_hwhm",
                     f"{band}_fwhm", f"{band}_fwhm_asymmetry")
            if len(b) < 5:
                for n in names:
                    r[n] = np.nan
                asyms.append(np.nan)
                continue
            tt = b["Time (MJD)"].to_numpy()
            ff = b["Flux"].to_numpy()
            pi = int(np.argmax(ff))
            pt, pf = tt[pi], ff[pi]
            if pf <= 0:
                for n in names:
                    r[n] = np.nan
                asyms.append(np.nan)
                continue
            half = pf / 2.0

            def hwhm(ts, fs, rising):
                if len(ts) < 2:
                    return np.nan
                above = fs >= half
                if np.any(above) and np.any(~above):
                    idx = (np.where(above)[0][0] if rising
                           else np.where(~above)[0][0])
                    if idx > 0:
                        t1, t2 = ts[idx - 1], ts[idx]
                        f1, f2 = fs[idx - 1], fs[idx]
                        if f2 != f1:
                            tc = t1 + (half - f1) * (t2 - t1) / (f2 - f1)
                            return (pt - tc) if rising else (tc - pt)
                    return np.nan
                if np.all(above):
                    return (pt - ts[0]) if rising else (ts[-1] - pt)
                return np.nan

            rise = hwhm(tt[: pi + 1], ff[: pi + 1], True)
            fall = hwhm(tt[pi:], ff[pi:], False)
            r[f"{band}_rise_hwhm"] = rise
            r[f"{band}_fall_hwhm"] = fall
            if not np.isnan(rise) and not np.isnan(fall):
                r[f"{band}_fwhm"] = rise + fall
                band_fwhm[band] = rise + fall
            else:
                r[f"{band}_fwhm"] = np.nan
            if not np.isnan(rise) and not np.isnan(fall) and rise > 0:
                r[f"{band}_fwhm_asymmetry"] = fall / rise
                asyms.append(fall / rise)
            else:
                r[f"{band}_fwhm_asymmetry"] = np.nan
                asyms.append(np.nan)

        vals = list(band_fwhm.values())
        r["fwhm_mean"] = np.mean(vals) if vals else np.nan
        r["fwhm_std"] = np.std(vals) if vals else np.nan
        r["fwhm_max"] = np.max(vals) if vals else np.nan
        r["fwhm_min"] = np.min(vals) if vals else np.nan
        r["fwhm_g_over_r"] = (band_fwhm["g"] / band_fwhm["r"]
                              if "g" in band_fwhm and "r" in band_fwhm
                              and band_fwhm["r"] > 0 else np.nan)
        r["fwhm_r_over_i"] = (band_fwhm["r"] / band_fwhm["i"]
                              if "r" in band_fwhm and "i" in band_fwhm
                              and band_fwhm["i"] > 0 else np.nan)
        va = [a for a in asyms if not np.isnan(a)]
        r["fwhm_asymmetry_mean"] = np.mean(va) if va else np.nan
        return r

    rows = []
    for oid in meta.object_ids:
        r = oracle(lc[lc["object_id"] == oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = fwhm_mod.extract(packed)
    assert_parity(ours, ref, meta)


def test_temp_fwhm_parity(small_dataset):
    """temp_fwhm vs an inline NumPy oracle implementing the reference's
    per-object algorithm verbatim
    (reference: scripts/train_v59b_temp_at_fwhm.py:24-180)."""
    import pandas as pd
    from mallorn_tpu.features import temp_fwhm
    from tests.oracles.frames import to_reference_frames

    packed, meta, cols = small_dataset
    lc, _ = to_reference_frames(cols, meta)
    NAMES = ["temp_at_peak", "temp_at_rise_hm", "temp_at_fall_hm",
             "temp_change_hm", "temp_ratio_fall_rise",
             "temp_drop_peak_to_hm", "cooling_rate_to_hm"]

    def temp_gr(gf, rf):
        if np.isnan(gf) or np.isnan(rf) or gf <= 0 or rf <= 0:
            return np.nan
        g_r = -2.5 * np.log10(gf / rf)
        if g_r < -0.5:
            return 50000.0
        if g_r > 2.0:
            return 3000.0
        return 7000.0 / (g_r + 0.6)

    def flux_at(ts, fs, target, tol=10.0):
        if np.isnan(target) or np.min(np.abs(ts - target)) > tol:
            return np.nan
        idx = np.searchsorted(ts, target)
        if idx == 0:
            return fs[0]
        if idx >= len(ts):
            return fs[-1]
        t1, t2, f1, f2 = ts[idx - 1], ts[idx], fs[idx - 1], fs[idx]
        if t2 == t1:
            return f1
        return f1 + (target - t1) / (t2 - t1) * (f2 - f1)

    def oracle(sub):
        r = {n: np.nan for n in NAMES}
        g = sub[sub["Filter"] == "g"].sort_values("Time (MJD)")
        rb = sub[sub["Filter"] == "r"].sort_values("Time (MJD)")
        if len(g) < 5 or len(rb) < 5:
            return r
        gt, gf = g["Time (MJD)"].to_numpy(), g["Flux"].to_numpy()
        rt, rf = rb["Time (MJD)"].to_numpy(), rb["Flux"].to_numpy()
        pi = int(np.argmax(rf))
        pt, pf = rt[pi], rf[pi]
        if pf <= 0:
            return r
        half = pf / 2.0
        rise_t = np.nan
        for i in range(pi):
            if rf[i] < half <= rf[i + 1]:
                rise_t = rt[i] + (half - rf[i]) * (rt[i + 1] - rt[i]) \
                    / (rf[i + 1] - rf[i])
                break
        fall_t = np.nan
        for i in range(pi, len(rt) - 1):
            if rf[i] >= half > rf[i + 1]:
                fall_t = rt[i] + (half - rf[i]) * (rt[i + 1] - rt[i]) \
                    / (rf[i + 1] - rf[i])
                break

        def temp_at(tt):
            return temp_gr(flux_at(gt, gf, tt), flux_at(rt, rf, tt))

        r["temp_at_peak"] = temp_at(pt)
        r["temp_at_rise_hm"] = temp_at(rise_t)
        r["temp_at_fall_hm"] = temp_at(fall_t)
        tr_, tf_ = r["temp_at_rise_hm"], r["temp_at_fall_hm"]
        if not np.isnan(tr_) and not np.isnan(tf_):
            r["temp_change_hm"] = tf_ - tr_
            r["temp_ratio_fall_rise"] = tf_ / tr_ if tr_ > 0 else np.nan
        if not np.isnan(r["temp_at_peak"]) and not np.isnan(tf_):
            r["temp_drop_peak_to_hm"] = r["temp_at_peak"] - tf_
        if (not np.isnan(fall_t) and not np.isnan(r["temp_at_peak"])
                and not np.isnan(tf_) and fall_t - pt > 0):
            r["cooling_rate_to_hm"] = (r["temp_at_peak"] - tf_) / (fall_t - pt)
        return r

    rows = []
    for oid in meta.object_ids:
        r = oracle(lc[lc["object_id"] == oid])
        r["object_id"] = oid
        rows.append(r)
    ref = pd.DataFrame(rows)
    ours = temp_fwhm.extract(packed)
    assert_parity(ours, ref, meta)


def test_dered_matrix_matches_reference_semantics():
    """extinction.dered_matrix vs the reference's per-row transform
    (reference: scripts/train_v57_extinction_corrected.py:69-177):
    first-matching-pair wins, NaN/non-positive EBV -> zero correction,
    NaN values propagate, linear fallback coefficients."""
    from mallorn_tpu.features.extinction import (FALLBACK_COEFFS,
                                                 dered_matrix)

    names = ["g_r_peak", "r_i_post_10d", "u_g_mean", "i_z_x", "flux_std",
             "g_r_dered_peak", "u_g_r_mix"]
    X = np.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
                  [np.nan, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
                  [0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]], np.float64)
    ebv = np.array([0.1, np.nan, -0.2])

    Xd, dn = dered_matrix(X, names, ebv)

    def excess(e, b1, b2):
        if not np.isfinite(e) or e <= 0:
            return 0.0
        return e * (FALLBACK_COEFFS[b1] - FALLBACK_COEFFS[b2])

    # columns with a pair key and no _dered: all but flux_std and the
    # already-dered one; "u_g_r_mix" matches g_r FIRST (pair order)
    assert dn == ["g_r_dered_peak", "r_i_dered_post_10d", "u_g_dered_mean",
                  "i_z_dered_x", "u_g_r_dered_mix"]
    for k, (src_j, b1, b2) in enumerate(
            [(0, "g", "r"), (1, "r", "i"), (2, "u", "g"), (3, "i", "z"),
             (6, "g", "r")]):
        for i in range(3):
            want = X[i, src_j] - excess(ebv[i], b1, b2)
            got = Xd[i, k]
            if np.isnan(want):
                assert np.isnan(got)
            else:
                np.testing.assert_allclose(got, want, rtol=1e-12)
