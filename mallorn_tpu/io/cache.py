"""Feature cache: the staged-artifact store.

The reference checkpoints every expensive stage as a pickle
(reference: SURVEY.md §5.4; scripts/train_v19_multiband_gp.py:92-112 —
"if cache exists load, else compute and dump"). Same pattern here with
npz + a JSON feature-name manifest (the cross-stage contract).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def atomic_savez(path, **arrays) -> Path:
    """np.savez_compressed via a temp file + os.replace.

    A concurrent process doing load-or-compute on the same cache dir must
    never see (and np.load) a partially-written npz — same pattern as the
    .so compile in io/native.py and the selection artifact."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_suffix(".npz")
    tmp = path.with_name(f"{path.stem}.tmp{os.getpid()}.npz")
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    return path


def _atomic_write_text(path: Path, text: str) -> None:
    tmp = path.with_name(f"{path.name}.tmp{os.getpid()}")
    tmp.write_text(text)
    os.replace(tmp, path)


def save_features(path, features: Dict[str, np.ndarray],
                  object_ids: np.ndarray) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    from mallorn_tpu.features.base import feature_matrix

    mat, names = feature_matrix(features)  # one device transfer, not F
    # names live INSIDE the npz: the entry is a single atomic file, so no
    # crash or concurrent overwrite can ever pair one generation's names
    # with another generation's matrix. The JSON manifest is still
    # written for human inspection / older readers, but the loader does
    # not depend on it.
    atomic_savez(path, matrix=mat,
                 object_ids=np.asarray(object_ids).astype(str),
                 names=np.asarray(names, dtype=str))
    _atomic_write_text(path.with_suffix(".manifest.json"),
                       json.dumps({"names": names}))


def load_features(path) -> Tuple[np.ndarray, list, np.ndarray]:
    """Returns (matrix [N, F], names, object_ids)."""
    path = Path(path)
    z = np.load(path if path.suffix == ".npz" else path.with_suffix(".npz"),
                allow_pickle=False)
    if "names" in z.files:
        names = [str(n) for n in z["names"]]
    else:  # pre-round-4 entry: names only in the sidecar manifest
        names = json.loads(
            path.with_suffix(".manifest.json").read_text())["names"]
    mat = z["matrix"]
    if len(names) != mat.shape[1]:
        raise ValueError(
            f"feature cache {path.name}: {len(names)} names vs "
            f"{mat.shape[1]} columns (mismatched generations)")
    return mat, names, z["object_ids"]


def cached(path, compute_fn, object_ids=None):
    """Load from cache if present, else compute and persist.

    A cache entry that fails to PARSE (truncated by a kill before the
    writes became atomic, a deleted manifest on a pre-round-4 entry, a
    name/column generation mismatch) is treated as absent: deleted and
    recomputed, never a hard error. Transient errors (OOM, EINTR) are
    deliberately NOT caught — they must not destroy a valid artifact."""
    import zipfile

    path = Path(path)
    npz = path if path.suffix == ".npz" else path.with_suffix(".npz")
    if npz.exists():
        try:
            return load_features(npz)
        except (zipfile.BadZipFile, EOFError, KeyError, ValueError,
                json.JSONDecodeError, FileNotFoundError):
            npz.unlink(missing_ok=True)
            npz.with_suffix(".manifest.json").unlink(missing_ok=True)
    feats = compute_fn()
    save_features(npz, feats, object_ids)
    return load_features(npz)
