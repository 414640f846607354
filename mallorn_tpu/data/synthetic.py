"""Synthetic LSST-like lightcurve generator.

The reference repo ships no data (the Kaggle set is external), so the
framework carries its own physically-motivated simulator for tests and
benchmarks: TDEs (hot, constant color, t^-5/3 fallback decay), SNe Ia
(fast rise, exponential Co-56 decay, reddening), SNe II (plateau),
SLSN (slow + bright) and AGN (damped-random-walk, stochastic color).
Class physics follows the descriptions in the reference docs
(reference: README.md:15-31, src/features/tde_physics.py:1-15).

The generator reproduces the dataset *shape* of the competition:
~6 LSST bands, irregular cadence, flux errors, redshift metadata,
~5% TDE prevalence (reference: README.md:24-31).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from mallorn_tpu.utils.constants import LSST_BANDS, N_BANDS, WAVELENGTHS_NM
from mallorn_tpu.data.packing import Metadata, PackedLightcurves, pack_lightcurves

SPEC_TYPES = ("TDE", "SN Ia", "SN II", "SLSN", "AGN")

# Rough per-band color factors vs temperature: flux ~ blackbody-ish weights.
_WAVE = np.array(WAVELENGTHS_NM)


def _band_weights(temp_k: np.ndarray) -> np.ndarray:
    """Relative band fluxes for a blackbody-like SED at temp_k. [..., 6]"""
    # Wien-ish weighting: hotter -> bluer. Normalized to r band.
    lam = _WAVE[(None,) * temp_k.ndim] * 1e-9  # [..., 6] meters
    t = temp_k[..., None]
    hc_over_k = 0.0143877688  # m*K
    x = hc_over_k / (lam * np.maximum(t, 100.0))
    # Rayleigh-Jeans-corrected Planck shape (up to constants)
    w = 1.0 / (lam ** 4 * np.expm1(np.clip(x, 1e-3, 50.0)))
    return w / w[..., 2:3]  # normalize to r


def _model_flux(kind: str, t: np.ndarray, rng: np.random.Generator,
                z: float) -> Tuple[np.ndarray, np.ndarray]:
    """Rest-frame-ish lightcurve model. Returns (flux_r[t], temp_k[t])."""
    dil = 1.0 + z
    if kind == "TDE":
        t0 = rng.uniform(80, 180)
        rise = rng.uniform(15, 40) * dil
        peak = rng.uniform(60, 400)
        temp = np.full_like(t, rng.uniform(15000, 35000))
        dt = t - t0
        pre = np.exp(dt / rise)
        post = (1.0 + np.maximum(dt, 0.0) / (rng.uniform(20, 60) * dil)) ** (-5.0 / 3.0)
        f = peak * np.where(dt < 0, pre, post)
    elif kind == "SN Ia":
        t0 = rng.uniform(80, 180)
        rise = rng.uniform(13, 20) * dil
        fall = rng.uniform(25, 50) * dil
        peak = rng.uniform(40, 300)
        dt = t - t0
        f = peak * np.exp(-np.maximum(dt, 0) / fall) / (1 + np.exp(-dt / (rise / 3)))
        temp = 11000.0 * np.exp(-np.maximum(dt, 0) / 120.0) + 3500.0
    elif kind == "SN II":
        t0 = rng.uniform(80, 180)
        plateau_len = rng.uniform(60, 110) * dil
        peak = rng.uniform(30, 200)
        dt = t - t0
        rise = rng.uniform(5, 12) * dil
        plat = np.where(dt < plateau_len, 1.0, np.exp(-(dt - plateau_len) / (15 * dil)))
        f = peak * plat / (1 + np.exp(-dt / (rise / 3)))
        f = np.where(dt < 0, peak * np.exp(dt / rise), f)
        temp = 9000.0 * np.exp(-np.maximum(dt, 0) / 90.0) + 4500.0
    elif kind == "SLSN":
        t0 = rng.uniform(80, 180)
        rise = rng.uniform(30, 60) * dil
        fall = rng.uniform(60, 140) * dil
        peak = rng.uniform(200, 900)
        dt = t - t0
        f = peak * np.exp(-np.maximum(dt, 0) / fall) / (1 + np.exp(-dt / (rise / 3)))
        temp = 14000.0 * np.exp(-np.maximum(dt, 0) / 200.0) + 6000.0
    else:  # AGN: damped random walk
        n = len(t)
        tau = rng.uniform(100, 400)
        sigma = rng.uniform(0.1, 0.4)
        level = np.zeros(n)
        x = 0.0
        tp = t[0]
        for i in range(n):
            dt_i = t[i] - tp
            tp = t[i]
            a = np.exp(-dt_i / tau)
            x = a * x + sigma * np.sqrt(max(1 - a * a, 1e-12)) * rng.standard_normal()
            level[i] = x
        base = rng.uniform(30, 150)
        f = base * np.exp(level)
        temp = 9000.0 + 2500.0 * level  # color wanders with luminosity
    return np.maximum(f, 0.0), np.clip(temp, 3000.0, 60000.0)


def generate_dataset(
    n_objects: int,
    seed: int = 0,
    tde_frac: float = 0.05,
    mean_obs_per_band: float = 22.0,
    season_days: float = 330.0,
) -> Tuple[PackedLightcurves, Metadata, Dict[str, np.ndarray]]:
    """Generate a packed synthetic dataset.

    Returns (packed, metadata, flat_columns). flat_columns carries the raw
    observation table (reference CSV schema) for loader round-trip tests.
    """
    rng = np.random.default_rng(seed)

    n_tde = max(1, int(round(tde_frac * n_objects)))
    kinds = np.array(["TDE"] * n_tde + list(
        rng.choice(["SN Ia", "SN II", "SLSN", "AGN"],
                   size=n_objects - n_tde, p=[0.45, 0.3, 0.05, 0.2])))
    rng.shuffle(kinds)

    obj_rows, t_rows, f_rows, e_rows, b_rows = [], [], [], [], []
    zs = np.zeros(n_objects, dtype=np.float32)
    ebvs = np.zeros(n_objects, dtype=np.float32)
    targets = np.zeros(n_objects, dtype=np.int32)

    for i in range(n_objects):
        kind = kinds[i]
        z = float(rng.uniform(0.01, 0.9))
        zs[i] = z
        ebvs[i] = float(rng.gamma(2.0, 0.02))
        targets[i] = 1 if kind == "TDE" else 0

        for b in range(N_BANDS):
            n_obs = max(3, int(rng.poisson(mean_obs_per_band)))
            t = np.sort(rng.uniform(0.0, season_days, size=n_obs))
            f_r, temp = _model_flux(kind, t, rng, z)
            w = _band_weights(temp)  # [n_obs, 6]
            f_band = f_r * w[:, b]
            err = 2.0 + 0.05 * np.abs(f_band) + rng.exponential(1.5, size=n_obs)
            f_obs = f_band + err * rng.standard_normal(n_obs)
            obj_rows.append(np.full(n_obs, i, dtype=np.int64))
            t_rows.append(t + 60000.0)  # MJD-like offset
            f_rows.append(f_obs)
            e_rows.append(err)
            b_rows.append(np.full(n_obs, b, dtype=np.int64))

    cols = {
        "object_index": np.concatenate(obj_rows),
        "time": np.concatenate(t_rows),
        "flux": np.concatenate(f_rows),
        "flux_err": np.concatenate(e_rows),
        "band": np.concatenate(b_rows),
    }

    packed = pack_lightcurves(
        cols["object_index"], cols["time"], cols["flux"], cols["flux_err"],
        cols["band"], n_objects)

    meta = Metadata(
        object_ids=np.array([f"SYN{i:06d}" for i in range(n_objects)]),
        z=zs,
        ebv=ebvs,
        target=targets,
        spec_type=kinds,
    )
    return packed, meta, cols


def write_reference_layout(path, packed_cols: Dict[str, np.ndarray],
                           meta: Metadata, n_splits: int = 4,
                           split: str = "train") -> None:
    """Write the synthetic set in the reference's on-disk CSV layout.

    Layout (reference: src/utils/data_loader.py:20-62): ``{split}_log.csv``
    at the root plus ``split_XX/{split}_full_lightcurves.csv`` shards.
    """
    import pandas as pd
    from pathlib import Path

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    log = pd.DataFrame({
        "object_id": meta.object_ids,
        "Z": meta.z,
        "EBV": meta.ebv,
    })
    if meta.spec_type is not None:
        log["SpecType"] = meta.spec_type
    if meta.target is not None and split == "train":
        log["target"] = meta.target
    log.to_csv(path / f"{split}_log.csv", index=False)

    band_names = np.array(LSST_BANDS)
    df = pd.DataFrame({
        "object_id": meta.object_ids[packed_cols["object_index"]],
        "Time (MJD)": packed_cols["time"],
        "Flux": packed_cols["flux"],
        "Flux_err": packed_cols["flux_err"],
        "Filter": band_names[packed_cols["band"]],
    })
    # Shard objects across split dirs like the reference's 20 split dirs.
    shard = packed_cols["object_index"] % n_splits
    for s in range(n_splits):
        d = path / f"split_{s + 1:02d}"
        d.mkdir(exist_ok=True)
        df[shard == s].to_csv(d / f"{split}_full_lightcurves.csv", index=False)
