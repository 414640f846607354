"""CSV data loading matching the reference's on-disk layout.

Schema contract (reference: src/utils/data_loader.py):
- ``{split}_log.csv``: object_id, Z, EBV, [SpecType], [target]   (:20-33)
- ``split_01..split_NN/{split}_full_lightcurves.csv``:
  object_id, Time (MJD), Flux, Flux_err, Filter                  (:36-62)

Loading is host-side (pandas) followed by a single vectorized pack into
device tensors. A native C++ CSV fast-path can be slotted in behind
``load_lightcurves`` without changing callers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from mallorn_tpu.utils.constants import BAND_INDEX
from mallorn_tpu.data.packing import Metadata, PackedLightcurves, pack_lightcurves

MAX_SPLIT_DIRS = 20  # reference scans split_01..split_20 (data_loader.py:53)


def load_metadata(data_path: Path, split: str = "train") -> pd.DataFrame:
    return pd.read_csv(Path(data_path) / f"{split}_log.csv")


def load_lightcurves(data_path: Path, split: str = "train") -> pd.DataFrame:
    """Concatenate all split-shard lightcurve CSVs for a split."""
    data_path = Path(data_path)
    filename = f"{split}_full_lightcurves.csv"
    frames = []
    for i in range(1, MAX_SPLIT_DIRS + 1):
        p = data_path / f"split_{i:02d}" / filename
        if p.exists():
            frames.append(pd.read_csv(p))
    if not frames:
        raise FileNotFoundError(f"No {split} lightcurve files found under {data_path}")
    return pd.concat(frames, ignore_index=True)


def pack_split(
    lc: pd.DataFrame,
    log: pd.DataFrame,
    max_band_len: Optional[int] = None,
    max_total_len: Optional[int] = None,
) -> Tuple[PackedLightcurves, Metadata]:
    """Convert raw DataFrames into packed device tensors + host metadata.

    Object row order follows the log file (the reference keys everything by
    the metadata object order, e.g. scripts/train_v34a_bazin.py:50-52).
    """
    object_ids = log["object_id"].to_numpy()
    id_to_row = {oid: i for i, oid in enumerate(object_ids)}

    obj_idx = lc["object_id"].map(id_to_row).to_numpy()
    valid = ~pd.isna(obj_idx)
    obj_idx = obj_idx[valid].astype(np.int64)

    band = lc.loc[valid, "Filter"].map(BAND_INDEX).to_numpy(dtype=np.int64)

    packed = pack_lightcurves(
        obj_idx,
        lc.loc[valid, "Time (MJD)"].to_numpy(dtype=np.float64),
        lc.loc[valid, "Flux"].to_numpy(dtype=np.float64),
        lc.loc[valid, "Flux_err"].to_numpy(dtype=np.float64),
        band,
        n_objects=len(object_ids),
        max_band_len=max_band_len,
        max_total_len=max_total_len,
    )

    meta = Metadata(
        object_ids=object_ids,
        z=log["Z"].to_numpy(dtype=np.float32) if "Z" in log else np.zeros(len(object_ids), np.float32),
        ebv=log["EBV"].to_numpy(dtype=np.float32) if "EBV" in log else np.zeros(len(object_ids), np.float32),
        target=log["target"].to_numpy(dtype=np.int32) if "target" in log else None,
        spec_type=log["SpecType"].to_numpy() if "SpecType" in log else None,
    )
    return packed, meta


def pack_split_native(data_path: Path, log: pd.DataFrame, split: str
                      ) -> Optional[Tuple[PackedLightcurves, Metadata]]:
    """Native-parser fast path: per-shard C++ CSV parse -> remap each
    shard's local object table onto the metadata row order -> one global
    pack. Returns None when the native library is unavailable."""
    from mallorn_tpu.io import native

    if not native.available():
        return None

    object_ids = log["object_id"].to_numpy()
    id_to_row = {str(oid): i for i, oid in enumerate(object_ids)}

    cols = {k: [] for k in ("object_index", "time", "flux", "flux_err", "band")}
    found = False
    filename = f"{split}_full_lightcurves.csv"
    for i in range(1, MAX_SPLIT_DIRS + 1):
        p = Path(data_path) / f"split_{i:02d}" / filename
        if not p.exists():
            continue
        d = native.parse_lightcurves(p)
        if d is None:
            return None
        found = True
        # local id table -> metadata rows (-1 = unknown object, dropped)
        remap = np.array([id_to_row.get(oid, -1) for oid in d["object_ids"]],
                         dtype=np.int64)
        gidx = remap[d["object_index"]]
        keep = gidx >= 0
        cols["object_index"].append(gidx[keep])
        for k in ("time", "flux", "flux_err", "band"):
            cols[k].append(d[k][keep])
    if not found:
        raise FileNotFoundError(f"No {split} lightcurve files found under {data_path}")

    flat = {k: np.concatenate(v) for k, v in cols.items()}
    packed = pack_lightcurves(flat["object_index"], flat["time"], flat["flux"],
                              flat["flux_err"], flat["band"],
                              n_objects=len(object_ids))
    meta = Metadata(
        object_ids=object_ids,
        z=log["Z"].to_numpy(dtype=np.float32) if "Z" in log else np.zeros(len(object_ids), np.float32),
        ebv=log["EBV"].to_numpy(dtype=np.float32) if "EBV" in log else np.zeros(len(object_ids), np.float32),
        target=log["target"].to_numpy(dtype=np.int32) if "target" in log else None,
        spec_type=log["SpecType"].to_numpy() if "SpecType" in log else None,
    )
    return packed, meta


def load_all_data(data_path: Path, use_native: bool = True) -> Dict[str, object]:
    """Load + pack both splits (mirrors reference load_all_data, :65-88).

    Prefers the C++ CSV fast path; falls back to pandas transparently."""
    out: Dict[str, object] = {}
    for split in ("train", "test"):
        try:
            log = load_metadata(data_path, split)
        except FileNotFoundError:
            continue
        try:
            result = pack_split_native(data_path, log, split) if use_native else None
        except FileNotFoundError:
            continue
        if result is None:
            try:
                lc = load_lightcurves(data_path, split)
            except FileNotFoundError:
                continue
            result = pack_split(lc, log)
        packed, meta = result
        out[f"{split}_packed"] = packed
        out[f"{split}_meta"] = meta
    if not out:
        raise FileNotFoundError(f"no data found under {data_path}")
    if "train_packed" in out and "test_packed" in out:
        # shared time padding -> extraction kernels compile once per config
        from mallorn_tpu.data.packing import unify_time_padding

        out["train_packed"], out["test_packed"] = unify_time_padding(
            out["train_packed"], out["test_packed"])
    return out
