"""Feature-layer plumbing.

A feature module exposes ``extract(packed, meta) -> FeatureSet`` where
``FeatureSet`` is an ordered ``{name: [N] float32 array}`` dict. Each module
wraps a per-object kernel with ``jax.vmap`` over the object axis; the kernel
receives per-object slices of the packed views.

``feature_matrix`` materializes a named column matrix — the cross-stage
contract mirroring the reference's feature-name manifests
(reference: scripts/train_v34a_bazin.py:269-279, v34a_artifacts
``feature_names``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.data.packing import PackedLightcurves

FeatureSet = Dict[str, jnp.ndarray]


class ObjectView(NamedTuple):
    """Per-object slices handed to feature kernels (all padded+masked)."""

    band_time: jnp.ndarray  # [6, T]
    band_flux: jnp.ndarray
    band_err: jnp.ndarray
    band_mask: jnp.ndarray
    all_time: jnp.ndarray  # [TA]
    all_flux: jnp.ndarray
    all_err: jnp.ndarray
    all_band: jnp.ndarray
    all_mask: jnp.ndarray


def object_view(packed: PackedLightcurves) -> ObjectView:
    return ObjectView(
        packed.band_time, packed.band_flux, packed.band_err, packed.band_mask,
        packed.all_time, packed.all_flux, packed.all_err, packed.all_band,
        packed.all_mask,
    )


def vmap_features(kernel: Callable[..., FeatureSet]):
    """vmap a per-object kernel over the object axis.

    The kernel's first argument is an ObjectView of one object; any further
    positional args are per-object scalars (e.g. redshift [N]).
    """
    @jax.jit
    def extract(packed: PackedLightcurves, *per_object_args) -> FeatureSet:
        view = object_view(packed)
        return jax.vmap(kernel)(view, *per_object_args)

    return extract


def feature_matrix(features: FeatureSet, names: Optional[Sequence[str]] = None
                   ) -> Tuple[np.ndarray, List[str]]:
    """Stack a FeatureSet into an [N, F] float32 matrix + column names."""
    if names is None:
        names = list(features.keys())
    cols = [np.asarray(features[n], dtype=np.float32) for n in names]
    return np.stack(cols, axis=1), list(names)


def feature_matrix_jnp(features: FeatureSet, names: Sequence[str]) -> jnp.ndarray:
    """Traceable [N, F] matrix build (for fully-jitted forward paths)."""
    return jnp.stack([features[n].astype(jnp.float32) for n in names], axis=1)


def merge(*feature_sets: FeatureSet, pandas_suffix: bool = False) -> FeatureSet:
    """Left-to-right merge of feature sets.

    With ``pandas_suffix=True``, name collisions are renamed ``_x``/``_y``
    exactly as the reference's pandas merges do (e.g. ``temp_stability``
    exists in both the colors and tde-physics caches; v34a's merge produces
    ``temp_stability_x``/``temp_stability_y`` — scripts/train_v34a_bazin.py:75-90).
    Without it, collisions raise.
    """
    out: Dict[str, jnp.ndarray] = {}
    for fs in feature_sets:
        for k, v in fs.items():
            if k in out:
                if not pandas_suffix:
                    raise ValueError(f"duplicate feature name across modules: {k}")
                out[f"{k}_x"] = out.pop(k)
                out[f"{k}_y"] = v
            else:
                out[k] = v
    return out
