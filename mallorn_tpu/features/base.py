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

    Calls route through the persistent executable cache (utils.aot_cache):
    with MALLORN_AOT_CACHE set, a fresh process loads the serialized
    executable instead of re-compiling through the remote-compile tunnel.
    """
    tag = f"feat_{kernel.__module__.rsplit('.', 1)[-1]}"

    @jax.jit
    def _extract(packed: PackedLightcurves, *per_object_args) -> FeatureSet:
        view = object_view(packed)
        return jax.vmap(kernel)(view, *per_object_args)

    def extract(packed: PackedLightcurves, *per_object_args) -> FeatureSet:
        from mallorn_tpu.utils.aot_cache import call_cached

        return call_cached(_extract, (packed, *per_object_args), tag=tag)

    return extract


def feature_matrix(features: FeatureSet, names: Optional[Sequence[str]] = None
                   ) -> Tuple[np.ndarray, List[str]]:
    """Stack a FeatureSet into an [N, F] float32 matrix + column names.

    Device-resident columns are stacked ON DEVICE and fetched with ONE
    transfer — ``np.asarray`` per column costs a tunnel round-trip each
    (224 columns x 2 splits measured ~11 s of pure latency)."""
    if names is None:
        names = list(features.keys())
    vals = [features[n] for n in names]
    if any(isinstance(v, jax.Array) for v in vals):
        from mallorn_tpu.utils.aot_cache import call_cached

        X = np.asarray(call_cached(
            _stack_jit, tuple(jnp.asarray(v, jnp.float32) for v in vals),
            tag="feat_stack"))
    else:
        X = np.stack([np.asarray(v, np.float32) for v in vals], axis=1)
    return X, list(names)


@jax.jit
def _stack_jit(*cols):
    return jnp.stack(cols, axis=1)


def chunked_extract(extract_fn, packed: PackedLightcurves, *args,
                    chunk_size: int = 2048, **kwargs) -> FeatureSet:
    """Run a feature extractor in fixed-size object chunks.

    Bounds peak HBM (several kernels materialize [chunk, T, T] pairwise
    buffers) and reuses one compiled shape for every full chunk. The final
    partial chunk is padded up to chunk_size and trimmed after. Per-object
    array args (e.g. redshift) are sliced alongside.
    """
    import numpy as np

    from mallorn_tpu.data.packing import Metadata, pad_objects

    n = packed.n_objects
    if n <= chunk_size:
        return extract_fn(packed, *args, **kwargs)

    def slice_arg(a, s, e, pad):
        if isinstance(a, Metadata):
            def _f(x):
                if x is None:
                    return None
                x = x[s:e]
                if pad:
                    x = np.concatenate([np.asarray(x),
                                        np.zeros((pad,) + np.asarray(x).shape[1:],
                                                 np.asarray(x).dtype)])
                return x
            return Metadata(object_ids=_f(a.object_ids), z=_f(a.z),
                            ebv=_f(a.ebv), target=_f(a.target),
                            spec_type=_f(a.spec_type))
        if a is not None and hasattr(a, "__len__") and len(a) == n:
            x = a[s:e]
            if pad:
                x = np.concatenate([np.asarray(x),
                                    np.zeros((pad,) + np.asarray(x).shape[1:],
                                             np.asarray(x).dtype)])
            return x
        return a

    outs = []
    for s in range(0, n, chunk_size):
        e = min(s + chunk_size, n)
        pad = chunk_size - (e - s) if e - s < chunk_size else 0
        sub = PackedLightcurves(
            *[x[s:e] if hasattr(x, "ndim") and x.ndim >= 1 else x
              for x in packed[:-1]], time_offset=packed.time_offset)
        if pad:
            sub = pad_objects(sub, chunk_size)
        sub_args = [slice_arg(a, s, e, pad) for a in args]
        out = extract_fn(sub, *sub_args, **kwargs)
        if pad:
            out = {k: v[: e - s] for k, v in out.items()}
        outs.append(out)
    return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}


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
