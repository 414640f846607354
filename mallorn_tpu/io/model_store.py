"""GBDT model persistence (the reference pickles fold models,
train_baseline.py:320-327; here: one npz per model with forest arrays,
bin edges, params and metadata — loadable for serving without any
training-side state)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import List

import jax.numpy as jnp
import numpy as np

from mallorn_tpu.trees.binning import BinSpec
from mallorn_tpu.trees.gbdt import Forest, GBDTModel, GBDTParams


def save_model(path, model: GBDTModel) -> Path:
    from mallorn_tpu.io.cache import atomic_savez

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    return atomic_savez(
        path,
        feature=np.asarray(model.forest.feature),
        split_bin=np.asarray(model.forest.split_bin),
        default_left=np.asarray(model.forest.default_left),
        is_leaf=np.asarray(model.forest.is_leaf),
        leaf_value=np.asarray(model.forest.leaf_value),
        edges=np.asarray(model.bin_spec.edges),
        importance_gain=np.asarray(model.importance_gain),
        eval_history=np.asarray(model.eval_history),
        best_iteration=model.best_iteration,
        params=json.dumps(model.params._asdict()),
        n_bins=model.bin_spec.n_bins,
    )


def load_model(path) -> GBDTModel:
    z = np.load(Path(path), allow_pickle=False)
    params = GBDTParams(**json.loads(str(z["params"])))
    forest = Forest(
        feature=jnp.asarray(z["feature"]),
        split_bin=jnp.asarray(z["split_bin"]),
        default_left=jnp.asarray(z["default_left"]),
        is_leaf=jnp.asarray(z["is_leaf"]),
        leaf_value=jnp.asarray(z["leaf_value"]),
    )
    spec = BinSpec(edges=jnp.asarray(z["edges"]), n_bins=int(z["n_bins"]))
    return GBDTModel(forest=forest, bin_spec=spec, params=params,
                     importance_gain=jnp.asarray(z["importance_gain"]),
                     eval_history=jnp.asarray(z["eval_history"]),
                     best_iteration=int(z["best_iteration"]))


def save_cv_models(dirpath, models: List[GBDTModel], threshold: float,
                   feature_names: List[str]) -> Path:
    d = Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    from mallorn_tpu.io.cache import _atomic_write_text

    for i, m in enumerate(models):
        save_model(d / f"fold_{i}.npz", m)
    # manifest LAST: load_cv_models gates on it, so once it lands every
    # fold file it references must already be in place
    _atomic_write_text(d / "manifest.json", json.dumps({
        "n_folds": len(models), "threshold": threshold,
        "feature_names": list(feature_names),
    }))
    return d


def load_cv_models(dirpath):
    d = Path(dirpath)
    man = json.loads((d / "manifest.json").read_text())
    models = [load_model(d / f"fold_{i}.npz") for i in range(man["n_folds"])]
    return models, man
