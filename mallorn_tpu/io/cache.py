"""Feature cache: the staged-artifact store.

The reference checkpoints every expensive stage as a pickle
(reference: SURVEY.md §5.4; scripts/train_v19_multiband_gp.py:92-112 —
"if cache exists load, else compute and dump"). Same pattern here with
npz + a JSON feature-name manifest (the cross-stage contract).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def save_features(path, features: Dict[str, np.ndarray],
                  object_ids: np.ndarray) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    from mallorn_tpu.features.base import feature_matrix

    mat, names = feature_matrix(features)  # one device transfer, not F
    np.savez_compressed(path, matrix=mat, object_ids=np.asarray(object_ids).astype(str))
    path.with_suffix(".manifest.json").write_text(json.dumps({"names": names}))


def load_features(path) -> Tuple[np.ndarray, list, np.ndarray]:
    """Returns (matrix [N, F], names, object_ids)."""
    path = Path(path)
    z = np.load(path if path.suffix == ".npz" else path.with_suffix(".npz"),
                allow_pickle=False)
    names = json.loads(path.with_suffix(".manifest.json").read_text())["names"]
    return z["matrix"], names, z["object_ids"]


def cached(path, compute_fn, object_ids=None):
    """Load from cache if present, else compute and persist."""
    path = Path(path)
    npz = path if path.suffix == ".npz" else path.with_suffix(".npz")
    if npz.exists():
        return load_features(npz)
    feats = compute_fn()
    save_features(npz, feats, object_ids)
    return load_features(npz)
