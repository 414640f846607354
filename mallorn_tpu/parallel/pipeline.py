"""The full v92d pipeline over a device mesh.

This is the framework's distributed deliverable (the reference is a
single-process CPU pipeline — SURVEY.md §2.2): raw packed lightcurves in,
TDE probabilities out, with

- feature extraction sharded over the object axis: every kernel is a
  vmapped per-object computation, so placing the inputs with a
  ``NamedSharding(mesh, P('obj'))`` lets XLA run them shard-local with
  zero communication (SPMD object-batch data parallelism);
- GBDT training sharded over the row axis with per-(feature, node, bin)
  histograms psum'd over ICI inside a fold-vmapped ``shard_map``
  (``parallel.sharded_train.train_gbdt_folds_sharded``) — XGBoost's
  distributed-hist algorithm mapped onto the mesh. Global-row-id
  subsampling keeps the trees EXACTLY equal to single-device training,
  including the winning config's subsample=0.8
  (reference: scripts/train_v34a_bazin.py:141).

The same code runs on one chip (mesh of 1) or a v5e-8 slice; tests
exercise it on an 8-device virtual CPU mesh.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from mallorn_tpu.data.packing import Metadata, PackedLightcurves
from mallorn_tpu.features import bazin, colors, multiband_gp, physics, shape, statistical, tde
from mallorn_tpu.features.base import FeatureSet, merge
from mallorn_tpu.parallel.mesh import OBJ_AXIS, make_mesh, object_sharding, shard_packed


def _pad_meta(meta: Metadata, n_pad: int, sharding=None) -> Metadata:
    def _f(x):
        if x is None:
            return None
        x = np.asarray(x)
        if len(x) < n_pad:
            x = np.concatenate(
                [x, np.zeros((n_pad - len(x),) + x.shape[1:], x.dtype)])
        if sharding is not None and np.issubdtype(x.dtype, np.number):
            x = jax.device_put(x, sharding)
        return x

    return Metadata(object_ids=np.asarray(meta.object_ids), z=_f(meta.z),
                    ebv=_f(meta.ebv), target=meta.target,
                    spec_type=meta.spec_type)


def extract_v34a_bundle_sharded(
    mesh, packed: PackedLightcurves, meta: Metadata,
    gp_steps: int = 100,
    chunk_size: Optional[int] = None,
    _gp_two_phase: Optional[bool] = None,
    _device_out: bool = False,
) -> Dict[str, FeatureSet]:
    """All four v34a feature caches with extraction sharded over the mesh.

    Same outputs as ``pipelines.extract_v34a_bundle`` (the single-device,
    chunked path); here each device extracts its object shard and the
    host gathers [n] feature columns at the end.

    ``chunk_size`` bounds peak HBM at competition scale exactly like the
    single-device path (several kernels build [chunk, T, T] pairwise
    buffers): objects are processed in shard-aligned chunks, each chunk
    sharded over the mesh. None = one chunk (fine for small/test runs).
    """
    n = packed.n_objects
    if chunk_size is not None and n > chunk_size:
        from mallorn_tpu.data.packing import pad_objects

        # process objects in valid-count-sorted order (like the
        # single-device multiband_gp.extract): each chunk's GP time axis
        # compacts to the chunk's own max count, so sparse chunks pay a
        # (T_c/T)^3 fraction of the Cholesky cost instead of everyone
        # paying the dataset max. Per-object outputs are exact, so the
        # permutation is undone at the end.
        af_ = np.asarray(packed.all_flux)
        ae_ = np.asarray(packed.all_err)
        am_ = np.asarray(packed.all_mask)
        counts_ = (am_ & np.isfinite(af_) & np.isfinite(ae_)
                   & (ae_ > 0)).sum(1)
        order = np.argsort(counts_, kind="stable")
        # two-phase GP gate decided from the GLOBAL compaction width so
        # chunk membership never changes an object's optimization path
        # (mirrors multiband_gp.extract)
        T_ = packed.all_time.shape[1]
        tc_g = min(T_, int(np.ceil(max(int(counts_.max(initial=1)), 32)
                                   / 32) * 32))
        gp_two_phase = bool(tc_g > 1.5 * multiband_gp._T_COARSE
                            and gp_steps >= 30)

        fields = [np.asarray(x) if hasattr(x, "ndim") and x.ndim >= 1 else x
                  for x in packed[:-1]]
        outs = []
        for s in range(0, n, chunk_size):
            idx = order[s: s + chunk_size]
            sub = PackedLightcurves(
                *[x[idx] if hasattr(x, "ndim") and x.ndim >= 1 else x
                  for x in fields], time_offset=packed.time_offset)
            if len(idx) < chunk_size:
                sub = pad_objects(sub, chunk_size)

            def _slice_meta(x):
                if x is None:
                    return None
                x = np.asarray(x)[idx]
                if len(idx) < chunk_size:
                    x = np.concatenate(
                        [x, np.zeros((chunk_size - len(idx),) + x.shape[1:],
                                     x.dtype)])
                return x

            sub_meta = Metadata(
                object_ids=np.asarray(meta.object_ids)[idx],
                z=_slice_meta(meta.z), ebv=_slice_meta(meta.ebv),
                target=meta.target, spec_type=meta.spec_type)
            # chunks stay ON DEVICE: per-chunk np.asarray conversions cost
            # a blocking host<->device sync per (chunk, family) — ~40
            # relay round-trips at ~66 ms each were most of the mesh
            # extraction's gap over the single-device path
            out = extract_v34a_bundle_sharded(mesh, sub, sub_meta, gp_steps,
                                              _gp_two_phase=gp_two_phase,
                                              _device_out=True)
            outs.append({fam: (names, X[: len(idx)])
                         for fam, (names, X) in out.items()})
        import jax.numpy as jnp

        inv = jnp.asarray(np.argsort(order))  # undo the count sort
        result = {}
        for fam in outs[0]:
            names = outs[0][fam][0]
            Xc = jnp.take(jnp.concatenate([o[fam][1] for o in outs]),
                          inv, axis=0)
            Xnp = np.asarray(Xc)  # ONE transfer per family
            result[fam] = {k: Xnp[:, i] for i, k in enumerate(names)}
        return result

    packed_sh = shard_packed(packed, mesh)
    n_pad = packed_sh.band_time.shape[0]
    sh = object_sharding(mesh)
    meta_sh = _pad_meta(meta, n_pad, sharding=sh)

    # GP time-compaction width: global max valid count, rounded to 32
    af, ae = np.asarray(packed.all_flux), np.asarray(packed.all_err)
    am = np.asarray(packed.all_mask)
    counts = (am & np.isfinite(af) & np.isfinite(ae) & (ae > 0)).sum(1)
    T = packed.all_time.shape[1]
    tc = min(T, int(np.ceil(max(int(counts.max(initial=1)), 32) / 32) * 32))
    if _gp_two_phase is None:
        _gp_two_phase = bool(tc > 1.5 * multiband_gp._T_COARSE
                             and gp_steps >= 30)

    def _trim(fs: FeatureSet):
        """Gather a family with ONE device->host transfer (per-column
        np.asarray costs a tunnel round-trip each — PERF.md round 2).
        Under ``_device_out`` the stacked [n, F] matrix stays on device
        (the chunked wrapper concatenates chunks and transfers once)."""
        import jax.numpy as jnp

        names = list(fs)
        X = jnp.stack([jnp.asarray(fs[k], jnp.float32) for k in names],
                      axis=1)
        if _device_out:
            return names, X[:n]
        X = np.asarray(X)
        return {k: X[:n, i] for i, k in enumerate(names)}

    import os as _os
    import time as _time

    _timers = _os.environ.get("MALLORN_TIMERS")
    _marks = [("start", _time.perf_counter())]

    def _mark(name):
        if _timers:
            _marks.append((name, _time.perf_counter()))

    features_v4 = merge(
        statistical.extract(packed_sh, meta_sh),
        colors.extract(packed_sh, meta_sh),
        shape.extract(packed_sh),
        physics.extract(packed_sh, meta_sh),
        pandas_suffix=True,
    )
    from mallorn_tpu.utils.aot_cache import call_cached

    out = {"features_v4": _trim(features_v4)}
    _mark("features_v4")
    out["tde_physics"] = _trim(tde.extract(packed_sh))
    _mark("tde")
    # same AOT-cached entry point as the single-device path (a fresh
    # process otherwise pays a full remote GP compile on the mesh)
    out["multiband_gp"] = _trim(call_cached(
        multiband_gp._extract_chunk,
        (packed_sh, gp_steps, tc, _gp_two_phase),
        tag="gp2d", static_argnums=(1, 2, 3)))
    _mark("gp2d")
    out["bazin"] = _trim(bazin.extract(packed_sh))
    _mark("bazin")
    if _timers:
        import sys as _sys

        deltas = {n: round(t1 - t0, 2) for (_, t0), (n, t1)
                  in zip(_marks, _marks[1:])}
        print(f"      [mesh-extract] chunk={n_pad}: {deltas}",
              file=_sys.stderr, flush=True)
    return out


def run_v92d_pipeline_sharded(
    mesh,
    train_packed: PackedLightcurves, train_meta: Metadata,
    test_packed: PackedLightcurves, test_meta: Metadata,
    params=None,
    selection_params=None,
    gp_steps: int = 100,
    top_k: int = 120,
    adv_params=None,
    variants: Optional[Dict] = None,
    chunk_size: Optional[int] = None,
    selection_cache=None,
    verbose: bool = False,
):
    """The complete winning pipeline on a mesh: sharded extraction ->
    selection CV -> v34a assembly -> adversarial validation -> v92
    training, every GBDT fold row-sharded with psum'd histograms.

    Mirrors reference train_v92_focal_adversarial.py:232-272 end to end.
    ``variants`` defaults to the winning v92d config; pass
    ``pipelines.V92_VARIANTS`` (or any subset, incl. the focal gamma>0
    configs) to train other variants sharded. ``chunk_size`` bounds
    extraction HBM at competition scale. ``selection_cache``: path of the
    staged selection artifact (the reference's ``selected_features.pkl``
    semantics — computed once, loaded thereafter). Returns
    (V92Result, timings).
    """
    import time

    from mallorn_tpu.features.base import feature_matrix
    from mallorn_tpu.train import pipelines
    from mallorn_tpu.train.adversarial import ADV_PARAMS, adversarial_validation
    from mallorn_tpu.train.cv import train_cv
    from mallorn_tpu.train.feature_selection import (cached_select_features,
                                                     select_features)
    from mallorn_tpu.utils.aot_cache import config_digest, tag_suffix

    params = params or pipelines.V34A_PARAMS
    timings = {}

    with tag_suffix("_mesh"):
        t0 = time.perf_counter()
        tr_bundle = extract_v34a_bundle_sharded(
            mesh, train_packed, train_meta, gp_steps, chunk_size=chunk_size)
        te_bundle = extract_v34a_bundle_sharded(
            mesh, test_packed, test_meta, gp_steps, chunk_size=chunk_size)
        timings["features_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        Xv4, v4_names = feature_matrix(tr_bundle["features_v4"])
        Xv4 = pipelines._finite_or_nan(Xv4)

        def _sel_importance():
            sel_cv = train_cv(Xv4, train_meta.target, None,
                              selection_params or params,
                              pad_features_to=pipelines.PAD_FEATURES,
                              mesh=mesh, verbose=False)
            return sel_cv.importance_gain

        if selection_cache is not None:
            selection = cached_select_features(
                selection_cache, Xv4, train_meta.target, v4_names,
                _sel_importance, top_k,
                key_extra=config_digest(selection_params or params))
        else:
            selection = select_features(Xv4, v4_names, _sel_importance(),
                                        top_k)
        X_tr, names = pipelines.assemble_v34a_matrix(tr_bundle,
                                                     selection.selected)
        X_te, _ = pipelines.assemble_v34a_matrix(te_bundle, selection.selected)
        timings["selection_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = pipelines.run_v92(
            X_tr, train_meta.target, names, X_te, params=params,
            variants=variants or {"v92d_baseline_adv":
                                  {"gamma": 0.0, "use_scale_pos_weight": True}},
            adv_params=adv_params, mesh=mesh, verbose=verbose)
        timings["train_s"] = time.perf_counter() - t0
    return out, timings
