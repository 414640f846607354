"""Multi-chip training step: shard_map over the object axis.

This is the framework's distributed path (the reference has none —
SURVEY.md §2.2): feature extraction runs shard-local; the GBDT's
per-(feature, node, bin) gradient histograms are ``lax.psum`` over the
mesh so every device computes identical splits — the numeric contract is
"same trees as single-device".
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mallorn_tpu.data.packing import PackedLightcurves
from mallorn_tpu.features import statistical
from mallorn_tpu.features.base import feature_matrix_jnp
from mallorn_tpu.parallel.mesh import OBJ_AXIS, resolve_axis
from mallorn_tpu.trees import objectives
from mallorn_tpu.trees.gbdt import GBDTParams, _train_tree
from mallorn_tpu.trees.binning import BinSpec, apply_bins


def _row_quantum(n_dev: int, backend: str | None = None) -> int:
    """Row-padding quantum for mesh training.

    Per-SHARD row counts are what ``_fit_impl`` traces with inside the
    shard_map, so on TPU the global row axis must be a multiple of
    512 * n_dev: each shard's rows must be a 512 multiple for the
    bin-lane histogram kernel's row chunk to tile exactly
    (``_pick_row_chunk`` returns 0 on awkward counts like 8142, silently
    dropping to the ~2.5x-slower per-level one-hot path — measured in
    the round-3 sharded bench, PERF.md). Padded rows are zero-weight and
    inert. CPU meshes keep the natural n_dev quantum so sharded forests
    compare exactly against the unpadded single-device reference in
    tests."""
    backend = backend or jax.default_backend()
    return 512 * n_dev if backend == "tpu" else n_dev


def make_sharded_training_step(mesh: Mesh, params: GBDTParams,
                               feature_names, bin_spec: BinSpec,
                               axis=None):
    """Returns a jitted fn(packed, y, w, margin) -> (tree, new_margin).

    One full distributed boosting round: shard-local feature extraction
    -> shard-local binning -> psum'd histograms -> replicated tree
    -> shard-local margin update. All real collectives ride the mesh.
    """
    axis = resolve_axis(mesh, axis)

    def local_step(packed: PackedLightcurves, y, w, margin):
        feats = statistical.extract(packed)
        X = feature_matrix_jnp(feats, feature_names)
        binned = apply_bins(bin_spec, X)

        grad, hess = objectives.logistic(margin, y, w)
        col_mask = jnp.ones(X.shape[1], bool)
        tree, gains, node_assign = _train_tree(
            binned.T, binned, grad, hess, col_mask, params, axis)
        leaf_value = tree[4]
        new_margin = margin + leaf_value[node_assign]
        return tree, new_margin

    # every PackedLightcurves leaf has a leading object axis except the
    # scalar time_offset
    packed_spec = PackedLightcurves(
        band_time=P(axis), band_flux=P(axis), band_err=P(axis),
        band_mask=P(axis), all_time=P(axis), all_flux=P(axis),
        all_err=P(axis), all_band=P(axis), all_mask=P(axis),
        time_offset=P(),
    )

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(packed_spec, P(axis), P(axis), P(axis)),
        out_specs=((P(), P(), P(), P(), P()), P(axis)),
        check_vma=False,
    )
    return jax.jit(step)


def train_gbdt_sharded(mesh: Mesh, X, y, params: GBDTParams,
                       sample_weight=None, scale_pos_weight: float = 1.0,
                       axis=None):
    """Full distributed GBDT training: rows sharded over the mesh, bin
    edges global, histograms psum'd — every device builds identical trees
    (XGBoost's distributed-hist contract). Returns a GBDTModel identical
    (up to float reduction order) to single-device training.

    ``axis`` may be a single mesh axis name or a TUPLE of names for
    multi-slice meshes (``make_mesh_2d``): rows shard over the joint
    axes and the histogram psum spans both (hierarchical ICI+DCN
    reduction on real hardware).

    Row subsampling is keyed by the GLOBAL row id (gbdt._row_subsample_mask)
    so even subsample < 1 draws the exact same rows as single-device
    training — the identical-trees contract holds for the full v92d config
    (subsample=0.8, reference: scripts/train_v34a_bazin.py:141)."""
    import numpy as np

    from mallorn_tpu.trees import objectives
    from mallorn_tpu.trees.binning import apply_bins, fit_bins
    from mallorn_tpu.trees.gbdt import Forest, GBDTModel, LGForest, _fit_jit

    axis = resolve_axis(mesh, axis)
    n_dev = mesh.devices.size
    n = len(X)
    q = _row_quantum(n_dev)
    n_pad = ((n + q - 1) // q) * q

    Xp = np.concatenate([np.asarray(X, np.float32),
                         np.full((n_pad - n, X.shape[1]), np.nan, np.float32)])
    yp = np.concatenate([np.asarray(y, np.float32), np.zeros(n_pad - n, np.float32)])
    w = np.ones(n, np.float32) if sample_weight is None else np.asarray(sample_weight, np.float32)
    w = w * np.where(np.asarray(y) > 0.5, scale_pos_weight, 1.0)
    wp = np.concatenate([w, np.zeros(n_pad - n, np.float32)])

    bin_spec = fit_bins(Xp[:n], params.n_bins, sample_weight=w)

    binned = apply_bins(bin_spec, jnp.asarray(Xp))
    keys = jax.random.split(jax.random.PRNGKey(params.seed), params.n_rounds)
    row_ids = jnp.arange(n_pad, dtype=jnp.int32)

    def local_fit(binned_l, y_l, w_l, rid_l, keys_l):
        f, imp, hist, _mv = _fit_jit(binned_l, y_l, w_l, rid_l, binned_l[:1],
                                     y_l[:1], jnp.ones(1, bool), keys_l,
                                     params._replace(seed=0),
                                     objectives.logistic, False, axis)
        return tuple(f), imp, hist

    n_tree_arrays = 7 if params.grow_policy == "lossguide" else 5
    fit = shard_map(
        local_fit, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(tuple([P()] * n_tree_arrays), P(), P()),
        check_vma=False,
    )
    forest_t, imp, hist = jax.jit(fit)(binned, jnp.asarray(yp),
                                       jnp.asarray(wp), row_ids, keys)
    forest = (LGForest if len(forest_t) == 7 else Forest)(*forest_t)
    return GBDTModel(forest=forest, bin_spec=bin_spec, params=params,
                     importance_gain=imp, eval_history=hist, best_iteration=-1)


def train_gbdt_folds_sharded(
    mesh: Mesh,
    folds,  # sequence of dicts: X, y, w(opt), X_val, y_val, spw, seed
    params: GBDTParams,
    objective=None,
    early_stopping_rounds=None,
    pad_rows_to=None,
    pad_val_rows_to=None,
    pad_features_to=None,
    axis=None,
):
    """All CV folds as ONE vmapped + row-sharded computation.

    The fold axis is vmapped (concurrent folds, one compile) and the row
    axis of every fold is sharded over the mesh; per-(feature, node, bin)
    histograms psum over ICI inside the vmap. Because subsampling is keyed
    by global row ids, the resulting forests are identical to
    ``train_gbdt_folds`` on one device. Returns [GBDTModel] like
    ``train_gbdt_folds``.
    """
    from mallorn_tpu.trees import objectives
    from mallorn_tpu.trees.gbdt import (_fit_impl, _models_from_folds,
                                        _stack_folds)

    if objective is None:
        objective = objectives.logistic
    axis = resolve_axis(mesh, axis)

    n_dev = mesh.devices.size
    row_q = _row_quantum(n_dev)

    def _round_up(x, q=n_dev):
        return ((x + q - 1) // q) * q

    pad_rows_to = _round_up(pad_rows_to or max(len(f["X"]) for f in folds),
                            row_q)
    pad_val_rows_to = _round_up(
        pad_val_rows_to or max(len(f["X_val"]) for f in folds))
    if jax.default_backend() == "tpu":
        # feature axis to the histogram kernels' 32-lane block (on a real
        # TPU mesh the bin-lane kernel would otherwise pay a pad-copy per
        # level); CPU-mesh tests keep natural widths so sharded forests
        # compare exactly against the unpadded single-device reference
        f_real_max = max(np.asarray(f["X"]).shape[1] for f in folds)
        pad_features_to = ((max(pad_features_to or 0, f_real_max) + 31)
                           // 32) * 32
        if params.use_binlane_hist is None:
            # same HBM gate as train_gbdt_folds, at per-shard sizes
            bpe = 128 if params.hist_dtype in ("int8", "i8bf16") else 256
            bl_bytes = (len(folds) * pad_features_to
                        * (pad_rows_to // n_dev) * bpe)
            if bl_bytes > 5.5e9:
                params = params._replace(use_binlane_hist=False)
    arrs, specs, n_feat_real = _stack_folds(
        folds, params, pad_rows_to, pad_val_rows_to, pad_features_to)

    p0 = params._replace(seed=0)

    def local_fit(b, y_, w_, rid, bv, yv_, vm, ks):
        def one(b1, y1, w1, r1, bv1, yv1, vm1, k1):
            f, imp, hist, best_mv = _fit_impl(
                b1, y1, w1, r1, bv1, yv1, vm1, k1, p0,
                objective, True, axis, int(early_stopping_rounds or 0))
            return tuple(f), imp, hist, best_mv  # plain tuple: matches out_specs

        return jax.vmap(one)(b, y_, w_, rid, bv, yv_, vm, ks)

    n_tree_arrays = 7 if params.grow_policy == "lossguide" else 5
    # best_mv is computed shard-locally on each shard's contiguous block
    # of val rows; the spec reassembles the full vector. Multiclass fits
    # carry margins as [K, n_val] — the sharded axis is then the LAST
    # one, after the (vmapped) fold axis and the class axis.
    mv_spec = (P(None, None, axis) if params.num_class >= 2
               else P(None, axis))
    fit = shard_map(
        local_fit, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis), P(None, axis), P(None, axis), P()),
        out_specs=(tuple([P()] * n_tree_arrays), P(), P(), mv_spec),
        check_vma=False,
    )
    from mallorn_tpu.trees.gbdt import _folds_cache_tag
    from mallorn_tpu.utils.aot_cache import call_cached

    forests, imps, hists, best_mvs = call_cached(
        jax.jit(fit),
        (arrs["binned"], arrs["y"], arrs["w"], arrs["row_ids"],
         arrs["binned_val"], arrs["yv"], arrs["vmask"], arrs["keys"]),
        tag=(_folds_cache_tag(p0, objective, int(early_stopping_rounds or 0))
             # keyed by mesh SHAPE: a (2, 4) multi-slice mesh must not
             # share an executable with the (8,) 1-D mesh ("8" == "8"
             # keeps 1-D tags unchanged)
             + f"_mesh{'x'.join(str(s) for s in mesh.devices.shape)}"))
    return _models_from_folds(forests, imps, hists, specs, params,
                              n_feat_real, early_stopping_rounds,
                              best_mvs=best_mvs)


# ------------------------------------------------------- comm observability

def comm_volume_report(mesh: Mesh, n_rows: int, n_features: int,
                       params: GBDTParams, axis=None) -> dict:
    """Compile (don't run) the sharded GBDT fit and inventory its
    collective ops from the optimized HLO.

    Turns the analytic ICI comm-volume account (PERF.md) into a measured
    one: the returned shapes are what XLA actually emits for the mesh.
    Also a sharding-regression guard — any ``all-gather``/``all-to-all``
    means the row shard leaked into a replicated intermediate (rows must
    stay device-local; only histograms cross ICI).

    Returns {collectives: [(kind, shape_str, bytes)], psum_bytes_per_round,
    rows_resharded: bool}.
    """
    import re

    from mallorn_tpu.trees.binning import apply_bins, fit_bins
    from mallorn_tpu.trees.gbdt import _fit_jit

    axis = resolve_axis(mesh, axis)
    rng = np.random.default_rng(0)
    n_dev = mesh.devices.size
    q = _row_quantum(n_dev)
    n_pad = ((n_rows + q - 1) // q) * q
    X = rng.normal(size=(n_pad, n_features)).astype(np.float32)
    y = (X[:, 0] > 0).astype(np.float32)
    w = np.ones(n_pad, np.float32)

    bin_spec = fit_bins(X, params.n_bins, sample_weight=w)
    binned = apply_bins(bin_spec, jnp.asarray(X))
    keys = jax.random.split(jax.random.PRNGKey(0), params.n_rounds)
    rid = jnp.arange(n_pad, dtype=jnp.int32)

    def local_fit(b, y_, w_, r_, k_):
        f, imp, hist, _ = _fit_jit(b, y_, w_, r_, b[:1], y_[:1],
                                   jnp.ones(1, bool), k_,
                                   params._replace(seed=0),
                                   objectives.logistic, False, axis)
        return tuple(f), imp, hist

    n_tree_arrays = 7 if params.grow_policy == "lossguide" else 5
    fit = shard_map(
        local_fit, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(tuple([P()] * n_tree_arrays), P(), P()),
        check_vma=False)
    txt = (jax.jit(fit)
           .lower(binned, jnp.asarray(y), jnp.asarray(w), rid, keys)
           .compile().as_text())

    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8,
                   "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}
    pat = re.compile(
        r"=\s*([a-z0-9]+)\[([0-9,]*)\]\S*\s*"
        r"(all-reduce|all-gather|all-to-all|collective-permute|"
        r"reduce-scatter)\(")
    collectives, psum_bytes = [], 0
    for dt, dims, kind in pat.findall(txt):
        shape = [int(d) for d in dims.split(",") if d]
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtype_bytes.get(dt, 4)
        collectives.append((kind, f"{dt}[{dims}]", nbytes))
        if kind == "all-reduce":
            # every all-reduce in the fit executes once per boosting
            # round (the level loop is unrolled in the round body)
            psum_bytes += nbytes
    rows_resharded = any(k in ("all-gather", "all-to-all")
                         for k, _, _ in collectives)
    return {"collectives": collectives,
            "psum_bytes_per_round": psum_bytes,
            "rows_resharded": rows_resharded,
            "n_devices": n_dev}
