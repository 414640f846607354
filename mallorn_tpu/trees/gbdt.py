"""TPU histogram gradient-boosted trees.

The TPU-native replacement for XGBoost ``tree_method='hist'`` as configured
by every reference training script (reference: scripts/train_v34a_bazin.py:134-148,
non_successful_tests/scripts/train_v92_focal_adversarial.py:157-169):
depth-wise growth, 256-bin feature histograms, L1/L2 regularization,
min_child_weight, per-sample weights, scale_pos_weight, learned
missing-value (NaN) default directions, row/column subsampling, custom
grad/hess objectives, logloss early stopping and gain importances.

Design (XLA-first):
- the whole boosting loop is one ``lax.scan`` over rounds; each round
  builds one tree level-by-level (static unroll over the 5 levels);
- histograms are per-(feature, node, bin) grad/hess sums built with a
  vmapped ``segment_sum`` over rows — the object axis — and are the ONLY
  cross-device quantity: under a mesh they are ``lax.psum`` over the data
  shards, which is exactly XGBoost's distributed-hist algorithm mapped
  onto ICI (SURVEY.md §2.2);
- split search is a masked argmax over (feature, bin, default-direction),
  computed identically (redundantly) on every device;
- trees are fixed-shape heap arrays -> prediction is a few vectorized
  gathers per level, no data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.ops import hist_pallas
from mallorn_tpu.trees.binning import BinSpec, apply_bins, apply_bins_np, fit_bins
from mallorn_tpu.trees import objectives

Objective = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


class GBDTParams(NamedTuple):
    n_rounds: int = 500
    max_depth: int = 5
    learning_rate: float = 0.025
    subsample: float = 0.8
    colsample_bytree: float = 0.8
    min_child_weight: float = 3.0
    reg_alpha: float = 0.2
    reg_lambda: float = 1.5
    n_bins: int = 256
    min_split_gain: float = 1e-6
    seed: int = 42
    # histogram builder: None = auto (Pallas MXU kernel on TPU, where
    # XLA lowers the segment_sum scatter-adds to a serialized loop;
    # segment_sum elsewhere). True/False forces a path.
    use_pallas_hist: Optional[bool] = None
    # bin-lane streamed histograms: precompute the [F, N, 128] bin-lane
    # one-hot ONCE per fit and stream it from HBM each level, instead of
    # rebuilding it on the VPU 5 levels x n_rounds times (the build was
    # ~90% of the boosting round). None = auto: on for the TPU backend
    # in the depthwise path, off elsewhere. Costs F*N*256 bytes of HBM
    # per fold-lane; train_gbdt_folds auto-disables when the stacked
    # lanes would exceed the HBM budget.
    use_binlane_hist: Optional[bool] = None
    # bin-lane histogram arithmetic: "bf16" streams a bf16 one-hot and
    # bf16x3 grad/hess digits (exact); "i8bf16" streams an int8 one-hot
    # (HALF the HBM traffic and binlane footprint) converted to bf16
    # in-kernel — exactly equal outputs, measured fastest on v5e; "int8"
    # additionally uses 4-digit base-128 fixed-point grad/hess on an
    # int8 MXU dot (measured SLOWER on this Mosaic version — no native
    # int8 path — and only quantization-exact to ~N*2^-27). "i8full"
    # streams the FULL-bin int8 one-hot ([F, N, bins] instead of
    # [F, N, 128]+hib): 2-3x the HBM stream, but the node-side matrix
    # becomes feature-independent, deleting the per-feature VPU
    # compare+select that binds the 128-lane kernels — measured round 5:
    # 1.53/1.39/1.56 ms at nodes 1/4/16 vs 1.84/1.76/2.95 (i8bf16), fit
    # 11.2 vs 12.3 ms/round at the v92d shape. Shipped default.
    hist_dtype: str = "i8full"
    # level routing: "dynslice" fetches each level node's single split
    # column with a dynamic slice (<= 2^d slices + [N] selects per
    # level); "onehot" builds the full-width [N, F] feature one-hot
    # (F x the lane work, but gather-free). Identical outputs.
    route: str = "dynslice"
    # DART dropout boosting (LightGBM-DART capability, reference v111):
    # each round drops existing trees with this probability, fits against
    # the surviving ensemble, and renormalizes (new: 1/(k+1), dropped:
    # k/(k+1)). 0 = standard boosting.
    dart_rate: float = 0.0
    # tree growth: "depthwise" (XGBoost) splits whole levels;
    # "lossguide" (LightGBM leaf-wise) repeatedly splits the leaf with
    # the highest gain, up to max_leaves leaves, with max_depth as the
    # joint depth cap (reference: scripts/train_v110_lgbm_regularized.py:124-125
    # uses num_leaves=15, max_depth=4);
    # "symmetric" (CatBoost oblivious trees, reference v118/v123
    # scripts/train_v118_catboost.py:5-7): every node of a level shares
    # ONE (feature, bin, default-direction) split, chosen by the
    # node-summed gain — the tree is a 2^depth-leaf decision table.
    grow_policy: str = "depthwise"
    max_leaves: int = 31
    # margin-space prediction bias (XGBoost base_score). 0 matches
    # binary:logistic's default (logit(0.5)); the reg:squarederror
    # soft-label configs use 0.5 (XGBoost's raw default, untransformed
    # for regression).
    base_score: float = 0.0
    # validation metric for eval_history / early stopping: "logloss"
    # (binary), "rmse" (regression objectives), or "mlogloss"
    # (forced when num_class >= 2).
    eval_metric: str = "logloss"
    # K-class multi:softprob training (reference v62,
    # scripts/train_v62_multiclass_ensemble.py:176-177): labels are class
    # ids 0..K-1; each round builds K trees on softmax grad/hess
    # (grad = p_k - 1{y=k}, hess = max(2 p_k (1-p_k), 1e-16) — XGBoost's
    # SoftmaxMultiClassObj). 0 = binary.
    num_class: int = 0
    # histogram subtraction (LightGBM's parent-minus-sibling trick): at
    # level d >= 1 only LEFT children's histograms are built by the
    # kernel (half the matmul columns); each right child is the parent's
    # retained histogram minus its sibling's. Binlane path only.
    hist_subtract: bool = True
    # ABLATION ONLY (tools/probe_fit_ablate.py): replace every histogram
    # build with a cheap synthetic ramp that still forces realistic
    # splits + routing, to measure the non-histogram round chain.
    stub_hist: bool = False


class Forest(NamedTuple):
    """Stacked fixed-shape trees. R = rounds, I = 2^D - 1 internal slots,
    H = 2^(D+1) - 1 heap nodes."""

    feature: jnp.ndarray  # [R, I] int32
    split_bin: jnp.ndarray  # [R, I] int32
    default_left: jnp.ndarray  # [R, I] bool
    is_leaf: jnp.ndarray  # [R, I] bool (early leaves)
    leaf_value: jnp.ndarray  # [R, H] float32 (eta already applied)


class LGForest(NamedTuple):
    """Stacked leaf-wise (lossguide) trees: explicit child pointers since
    splits don't form a heap. M = 2*max_leaves - 1 node slots."""

    feature: jnp.ndarray  # [R, M] int32
    split_bin: jnp.ndarray  # [R, M] int32
    default_left: jnp.ndarray  # [R, M] bool
    is_leaf: jnp.ndarray  # [R, M] bool
    left: jnp.ndarray  # [R, M] int32
    right: jnp.ndarray  # [R, M] int32
    leaf_value: jnp.ndarray  # [R, M] float32 (eta applied)


class GBDTModel(NamedTuple):
    forest: Forest
    bin_spec: BinSpec
    params: GBDTParams
    importance_gain: jnp.ndarray  # [F]
    eval_history: jnp.ndarray  # [R] val logloss (nan if no val set)
    best_iteration: int  # host-side; -1 before finalize
    # validation-set margins AT best_iteration, tracked inside the fit
    # (the boosting loop already holds every round's val margins — a
    # separate OOF predict pass would re-run the forest AND cost a
    # 10-30 MB executable upload through the tunnel per CV). None on
    # paths that don't early-stop (DART, plain scan).
    val_margin: Optional[np.ndarray] = None


def _shrink(g, alpha):
    """XGBoost L1 thresholding of the gradient sum."""
    return jnp.sign(g) * jnp.maximum(jnp.abs(g) - alpha, 0.0)


def _leaf_weight(g, h, alpha, lam, eta):
    return -eta * _shrink(g, alpha) / (h + lam)


def _score(g, h, alpha, lam):
    s = _shrink(g, alpha)
    return s * s / (h + lam)


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def _row_subsample_mask(key, row_ids, rate):
    """Per-row Bernoulli keyed by the GLOBAL row id.

    The draw for a row depends only on (round key, row id) — independent
    of sharding, padding or layout — so distributed training builds
    EXACTLY the single-device trees even at subsample < 1 (the numeric
    contract of XGBoost's distributed hist algorithm, SURVEY.md §2.2).

    One vectorized murmur3-style integer mix instead of a per-row
    ``fold_in``/``uniform`` (a vmap of threefry key derivations measurably
    slows the 500-round boosting scan); statistical quality is ample for
    Bernoulli row masks.
    """
    kd = jnp.asarray(key, jnp.uint32).reshape(-1)
    x = row_ids.astype(jnp.uint32)
    x = x * jnp.uint32(0x9E3779B9) + kd[0]
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35) ^ kd[-1]
    x = x ^ (x >> 16)
    u = x.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
    return u < rate


def _pick_row_chunk(n: int, cap: int = 1280) -> int:
    """Largest multiple-of-128 divisor of ``n`` up to ``cap`` (0 if none).

    The bin-lane kernel's row chunk must tile the row axis exactly (or it
    pays a full-array copy per call) and be a multiple of 128 (Mosaic
    requires the last block dim divisible by 128 unless it spans the
    whole axis)."""
    best = 0
    for c in range(128, min(n, cap) + 1, 128):
        if n % c == 0:
            best = c
    return best


def _gather_table(table, idx):
    """``table[idx]`` for a SMALL table (tree node arrays, <= ~63 slots)
    as a one-hot contraction — XLA's gather of many indices from a tiny
    table lowers to a slow path on TPU (measured ~80 us per [7168]<-[31]
    lookup inside the prediction scan)."""
    k = table.shape[0]
    onehot = idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    if table.dtype == jnp.bool_:
        return jnp.any(onehot & table[None, :], axis=1)
    return jnp.sum(jnp.where(onehot, table[None, :], 0), axis=1)


def _gather_feature_values(binned, feat_idx):
    """``binned[r, feat_idx[r]]`` as a one-hot masked lane-reduction.

    XLA lowers the per-row minor-axis gather (take_along_axis) to a slow
    path on TPU; the [N, F] compare + select + lane-sum is a handful of
    full-width VPU ops and exact (one nonzero term per row)."""
    f = binned.shape[1]
    onehot = feat_idx[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, f), 1)
    return jnp.sum(jnp.where(onehot, binned, 0), axis=1)


def _build_level_hist(binned_T, grad, hess, local_node, in_level, n_nodes, n_bins_tot,
                      axis_name, use_pallas=False):
    """Histograms [F, n_nodes, n_bins_tot, 2] of (grad, hess) sums.

    binned_T: [F, N] bin ids; local_node: [N] node index within the level;
    in_level: [N] bool — row participates in this level's histograms.
    """
    n_seg = n_nodes * n_bins_tot
    seg_base = jnp.where(in_level, local_node * n_bins_tot, n_seg)

    data = jnp.stack([grad, hess], axis=-1)  # [N, 2]

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from mallorn_tpu.ops.hist_pallas import build_histograms_pallas

        seg_all = jnp.where(in_level[None, :], seg_base[None, :] + binned_T, n_seg)
        hist = build_histograms_pallas(seg_all.astype(jnp.int32), data, n_seg)
    else:
        def per_feature(bins_f):
            seg = jnp.where(in_level, seg_base + bins_f, n_seg)
            return jax.ops.segment_sum(data, seg, num_segments=n_seg + 1)[:-1]

        hist = jax.vmap(per_feature)(binned_T)  # [F, n_seg, 2]
    hist = hist.reshape(binned_T.shape[0], n_nodes, n_bins_tot, 2)
    return _psum(hist, axis_name)


def _best_splits(hist, col_mask, p: GBDTParams, symmetric: bool = False):
    """Best split per node from [F, K, B+1, 2] histograms.

    Returns (best_gain, best_f, best_b, best_dleft, g_tot, h_tot) — [K].

    ``symmetric``: CatBoost oblivious mode — ONE (feature, bin, default
    direction) shared by the whole level, chosen by the node-summed gain
    (invalid node splits contribute zero); the per-node return values are
    the shared split replicated, with the gain divided by K so that
    summing over nodes recovers the level total."""
    n_f = hist.shape[0]
    missing_id = p.n_bins
    hg, hh = hist[..., 0], hist[..., 1]  # [F, K, B+1]
    g_tot = jnp.sum(hg, axis=(0, 2)) / n_f  # per node; same for all f
    h_tot = jnp.sum(hh, axis=(0, 2)) / n_f
    # (all features see every row, so summing any single feature's bins
    # gives the node totals; averaging over F is numerically tidier)

    g_miss = hg[..., missing_id]  # [F, K]
    h_miss = hh[..., missing_id]
    cg = jnp.cumsum(hg[..., :missing_id], axis=-1)  # [F, K, B]
    ch = jnp.cumsum(hh[..., :missing_id], axis=-1)

    parent = _score(g_tot, h_tot, p.reg_alpha, p.reg_lambda)  # [K]

    def split_gain(gl, hl):
        gr = g_tot[None, :, None] - gl
        hr = h_tot[None, :, None] - hl
        gain = 0.5 * (
            _score(gl, hl, p.reg_alpha, p.reg_lambda)
            + _score(gr, hr, p.reg_alpha, p.reg_lambda)
            - parent[None, :, None]
        )
        ok = (hl >= p.min_child_weight) & (hr >= p.min_child_weight)
        return jnp.where(ok & col_mask[:, None, None], gain, -jnp.inf)

    gain_right = split_gain(cg, ch)  # missing goes right
    gain_left = split_gain(cg + g_miss[..., None], ch + h_miss[..., None])

    n_nodes = hist.shape[1]
    if symmetric:
        def level_total(g):  # [F, K, B] -> [F, B], invalid nodes add 0
            return jnp.where(g > 0, g, 0.0).sum(axis=1)

        tot_r, tot_l = level_total(gain_right), level_total(gain_left)
        tot = jnp.maximum(tot_r, tot_l)  # [F, B]
        flat = tot.reshape(-1)
        idx = jnp.argmax(flat)
        bg = flat[idx] / n_nodes
        bf = (idx // missing_id).astype(jnp.int32)
        bb = (idx % missing_id).astype(jnp.int32)
        bdl = (tot_l > tot_r).reshape(-1)[idx]

        def rep(x):
            return jnp.broadcast_to(x, (n_nodes,))

        return rep(bg), rep(bf), rep(bb), rep(bdl), g_tot, h_tot

    gain_fb = jnp.maximum(gain_right, gain_left)  # [F, K, B]
    dleft_fb = gain_left > gain_right

    flat = gain_fb.transpose(1, 0, 2).reshape(n_nodes, -1)  # [K, F*B]
    best_idx = jnp.argmax(flat, axis=-1)
    best_gain = jnp.take_along_axis(flat, best_idx[:, None], 1)[:, 0]
    best_f = (best_idx // missing_id).astype(jnp.int32)
    best_b = (best_idx % missing_id).astype(jnp.int32)
    best_dl = dleft_fb.transpose(1, 0, 2).reshape(n_nodes, -1)[
        jnp.arange(n_nodes), best_idx]
    return best_gain, best_f, best_b, best_dl, g_tot, h_tot


def _train_tree(binned_T, binned, grad, hess, col_mask, p: GBDTParams, axis_name,
                symmetric: bool = False, binlane=None):
    """Build one tree level by level: XGBoost depth-wise growth, or (with
    ``symmetric``) a CatBoost oblivious tree — same heap layout, but every
    level shares one split. Returns (tree arrays, per-feature gain,
    node_assign)."""
    n_f, n = binned_T.shape
    depth = p.max_depth
    n_internal = 2 ** depth - 1
    n_heap = 2 ** (depth + 1) - 1
    n_bins_tot = p.n_bins + 1  # + missing bin
    missing_id = p.n_bins

    feature = jnp.zeros(n_internal, jnp.int32)
    split_bin = jnp.full(n_internal, -1, jnp.int32)
    default_left = jnp.zeros(n_internal, bool)
    is_leaf = jnp.zeros(n_internal, bool)
    leaf_value = jnp.zeros(n_heap, jnp.float32)
    gain_per_feature = jnp.zeros(n_f, jnp.float32)

    node = jnp.zeros(n, jnp.int32)
    prev_hist = None  # [F, 2^(d-1), B+1, 2] full hists of the previous level
    prev_split = None  # [2^(d-1)] bool: previous-level node was split

    for d in range(depth):
        n_nodes = 2 ** d
        level_start = n_nodes - 1
        local = node - level_start
        in_level = (local >= 0) & (local < n_nodes) & ~is_leaf[jnp.clip(node, 0, n_internal - 1)]

        if binlane is not None:
            mode, bhot, hib, payload, bl_rc = binlane
            # Histogram subtraction (LightGBM parent-minus-sibling): at
            # d >= 1 the kernel builds only the 2^(d-1) LEFT children
            # (local index 2q -> q); right child = parent - left. Halves
            # the scatter-matmul width, whose cost is linear in the node
            # count (tools/probe_sweep.json: nodes16 4.55 ms vs nodes8
            # ~3.2 ms at the selection shape). Rows at leaves never
            # advance, so a leaf parent's left child receives zero rows;
            # its "right" is masked to zero via prev_split.
            subtract = p.hist_subtract and d > 0
            if subtract:
                k_nodes = n_nodes // 2
                node_q = jnp.where(in_level & (local % 2 == 0),
                                   local // 2, k_nodes)
            else:
                k_nodes = n_nodes
                node_q = jnp.where(in_level, local, n_nodes)
            # deep levels widen the per-feature matmul (6C columns grows
            # with the kernel node count); best (rc, fb) measured per
            # width (tools/probe_sweep.json + round-3 k8 sweep:
            # v92d nodes8 rc1280/fb32 2.00 ms vs rc2560/fb16 2.69;
            # sel(416f) nodes8 rc1280/fb16 3.68 vs rc2560/fb16 3.81;
            # nodes16 keeps the narrow-block wide-chunk config)
            if mode == "i8full":
                # no per-feature node-matrix rebuild -> deep levels stay
                # cheap at full blocks (probe_kernel.json round 5:
                # nodes16 fb32/rc2560 1.56 ms vs binlane 2.95-3.07)
                fb = hist_pallas.F_BLOCK
                rc = _pick_row_chunk(node.shape[0], cap=2560) or bl_rc
            elif k_nodes >= 16:
                fb = 16
                rc = _pick_row_chunk(node.shape[0], cap=2560) or bl_rc
            elif k_nodes == 8:
                fb = 16 if n_f >= 384 else hist_pallas.F_BLOCK
                rc = _pick_row_chunk(node.shape[0], cap=1280) or bl_rc
            else:
                fb = hist_pallas.F_BLOCK
                rc = bl_rc
            if p.stub_hist:
                # probe-only: ramp grads (split at mid-bin gains > 0 so
                # the search/routing/update chain runs realistically),
                # data dependence keeps it from constant-folding
                ramp = (jnp.arange(n_bins_tot, dtype=jnp.float32)
                        - n_bins_tot / 2) / n_bins_tot
                hist = jnp.broadcast_to(
                    jnp.stack([ramp, jnp.ones_like(ramp)], -1)
                    * (1.0 + grad[0] * 1e-20),
                    (n_f, k_nodes, n_bins_tot, 2))
            elif mode == "int8":
                gd, s_g, s_h = payload
                hist = _psum(hist_pallas.build_histograms_binlane_i8(
                    bhot, hib, node_q, gd, s_g, s_h, k_nodes, n_bins_tot,
                    row_chunk=rc, f_block=fb), axis_name)
            elif mode == "i8full":
                hist = _psum(hist_pallas.build_histograms_fullhot(
                    bhot, node_q, payload, k_nodes, n_bins_tot,
                    row_chunk=rc, f_block=fb), axis_name)
            else:
                hist = _psum(hist_pallas.build_histograms_binlane(
                    bhot, hib, node_q, payload, k_nodes, n_bins_tot,
                    row_chunk=rc, f_block=fb), axis_name)
            if subtract:
                right = jnp.where(prev_split[None, :, None, None],
                                  prev_hist - hist, 0.0)
                # interleave: full[:, 2q] = left, full[:, 2q+1] = right
                hist = jnp.stack([hist, right], axis=2).reshape(
                    hist.shape[0], n_nodes, *hist.shape[2:])
        else:
            hist = _build_level_hist(binned_T, grad, hess, local, in_level,
                                     n_nodes, n_bins_tot, axis_name,
                                     use_pallas=p.use_pallas_hist)
        best_gain, best_f, best_b, best_dl, g_tot, h_tot = _best_splits(
            hist, col_mask, p, symmetric=symmetric)

        if symmetric:
            # the shared split's gain is the LEVEL TOTAL divided by the
            # heap width 2^d (so per-feature importances sum correctly);
            # the stopping rule must compare the undivided total, or a
            # nonzero min_split_gain scales with depth and prunes deep
            # levels early (per-node semantics, depth-independent)
            make_leaf = best_gain * n_nodes <= p.min_split_gain
        else:
            make_leaf = best_gain <= p.min_split_gain  # covers -inf / empty nodes
        if binlane is not None and p.hist_subtract and d + 1 < depth:
            prev_hist, prev_split = hist, ~make_leaf
        ids = level_start + jnp.arange(n_nodes)

        feature = feature.at[ids].set(jnp.where(make_leaf, 0, best_f))
        split_bin = split_bin.at[ids].set(jnp.where(make_leaf, -1, best_b))
        default_left = default_left.at[ids].set(jnp.where(make_leaf, False, best_dl))
        is_leaf = is_leaf.at[ids].set(make_leaf)
        leaf_value = leaf_value.at[ids].set(jnp.where(
            make_leaf,
            _leaf_weight(g_tot, h_tot, p.reg_alpha, p.reg_lambda, p.learning_rate),
            0.0,
        ))

        gain_per_feature = gain_per_feature + jax.ops.segment_sum(
            jnp.where(make_leaf, 0.0, best_gain), best_f, num_segments=n_f)

        # route rows at this level (non-leaf nodes) to children
        if p.route == "dynslice":
            # per-node: ONE dynamic slice of the split feature's column +
            # [N]-wide selects, using this level's fresh split arrays
            # directly (no [N]<-[31] table gathers, no [N, F] one-hot);
            # symmetric trees share one split -> a single slice
            n_route = 1 if symmetric else n_nodes
            go_left = jnp.zeros(n, bool)
            moves = jnp.zeros(n, bool)
            for k in range(n_route):
                at_k = in_level if symmetric else in_level & (local == k)
                col = jax.lax.dynamic_index_in_dim(
                    binned_T, best_f[k], 0, keepdims=False)
                gl_k = jnp.where(col == missing_id, best_dl[k],
                                 col <= best_b[k])
                go_left = jnp.where(at_k, gl_k, go_left)
                moves = moves | (at_k & ~make_leaf[k])
            child = 2 * node + jnp.where(go_left, 1, 2)
            node = jnp.where(moves, child, node)
        else:
            feat_n = feature[jnp.clip(node, 0, n_internal - 1)]
            sbin_n = split_bin[jnp.clip(node, 0, n_internal - 1)]
            dleft_n = default_left[jnp.clip(node, 0, n_internal - 1)]
            bv = _gather_feature_values(binned, feat_n)
            is_missing = bv == missing_id
            go_left = jnp.where(is_missing, dleft_n, bv <= sbin_n)
            child = 2 * node + jnp.where(go_left, 1, 2)
            stays = ~in_level | is_leaf[jnp.clip(node, 0, n_internal - 1)]
            node = jnp.where(stays, node, child)

    # terminal leaves at the last level. One-hot matmul instead of
    # segment_sum: XLA lowers the scatter-add to a serialized row loop on
    # TPU (~3 ms/round); the [N, 2^D] indicator contraction is ~free.
    leaf_start = 2 ** depth - 1
    local = node - leaf_start
    at_leaf_level = (local >= 0) & (local < 2 ** depth)
    seg = jnp.where(at_leaf_level, local, 0)
    onehot = (seg[:, None] == jnp.arange(2 ** depth)[None, :]) & at_leaf_level[:, None]
    sums = jnp.dot(onehot.astype(jnp.float32).T,
                   jnp.stack([grad, hess], -1),
                   preferred_element_type=jnp.float32)
    sums = _psum(sums, axis_name)
    lv = _leaf_weight(sums[:, 0], sums[:, 1], p.reg_alpha, p.reg_lambda,
                      p.learning_rate)
    lv = jnp.where(sums[:, 1] > 0, lv, 0.0)
    leaf_value = leaf_value.at[leaf_start:].set(lv)

    tree = (feature, split_bin, default_left, is_leaf, leaf_value)
    return tree, gain_per_feature, node


def _predict_tree(tree, binned, missing_id, depth):
    """Leaf value per row for one tree (vectorized routing)."""
    feature, split_bin, default_left, is_leaf, leaf_value = tree
    n_internal = feature.shape[0]
    n = binned.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for _ in range(depth):
        cn = jnp.clip(node, 0, n_internal - 1)
        feat = _gather_table(feature, cn)
        bv = _gather_feature_values(binned, feat)
        is_missing = bv == missing_id
        go_left = jnp.where(is_missing, _gather_table(default_left, cn),
                            bv <= _gather_table(split_bin, cn))
        child = 2 * node + jnp.where(go_left, 1, 2)
        stays = (node >= n_internal) | _gather_table(is_leaf, cn)
        node = jnp.where(stays, node, child)
    return _gather_table(leaf_value, node)


def _train_tree_lossguide(binned_T, binned, grad, hess, col_mask,
                          p: GBDTParams, axis_name):
    """Build one LEAF-WISE tree (LightGBM's growth strategy): repeatedly
    split the leaf with the highest gain until max_leaves, with max_depth
    as the joint depth cap. Fixed shapes: a scan of max_leaves-1 split
    steps, each building a 2-child histogram over the rows of the chosen
    leaf (psum'd under a mesh like the depth-wise path).

    Returns ((feature, split_bin, default_left, is_leaf, left, right,
    leaf_value), gain_per_feature, node_assign)."""
    n_f, n = binned_T.shape
    L = p.max_leaves
    M = 2 * L - 1
    n_bins_tot = p.n_bins + 1
    missing_id = p.n_bins
    depth_cap = p.max_depth if p.max_depth > 0 else L  # LightGBM: -1 = off

    def root():
        ones = jnp.ones(n, bool)
        hist = _build_level_hist(binned_T, grad, hess, jnp.zeros(n, jnp.int32),
                                 ones, 1, n_bins_tot, axis_name,
                                 use_pallas=p.use_pallas_hist)
        return _best_splits(hist, col_mask, p)

    g0, f0, b0, dl0, gt0, ht0 = root()

    state = dict(
        feature=jnp.zeros(M, jnp.int32),
        split_bin=jnp.full(M, -1, jnp.int32),
        default_left=jnp.zeros(M, bool),
        is_leaf=jnp.ones(M, bool),
        left=jnp.zeros(M, jnp.int32),
        right=jnp.zeros(M, jnp.int32),
        node_g=jnp.zeros(M, jnp.float32).at[0].set(gt0[0]),
        node_h=jnp.zeros(M, jnp.float32).at[0].set(ht0[0]),
        depth=jnp.zeros(M, jnp.int32),
        # best-split cache per leaf; -inf = not splittable / not allocated
        bg=jnp.full(M, -jnp.inf, jnp.float32).at[0].set(
            jnp.where(depth_cap > 0, g0[0], -jnp.inf)),
        bf=jnp.zeros(M, jnp.int32).at[0].set(f0[0]),
        bb=jnp.zeros(M, jnp.int32).at[0].set(b0[0]),
        bdl=jnp.zeros(M, bool).at[0].set(dl0[0]),
        node=jnp.zeros(n, jnp.int32),
        n_nodes=jnp.asarray(1, jnp.int32),
        gain_pf=jnp.zeros(n_f, jnp.float32),
    )

    def split_step(s, _):
        l = jnp.argmax(s["bg"]).astype(jnp.int32)
        do = s["bg"][l] > p.min_split_gain
        li, ri = s["n_nodes"], s["n_nodes"] + 1

        fl, bl, dll = s["bf"][l], s["bb"][l], s["bdl"][l]

        def upd(a, idx, val):
            return a.at[idx].set(jnp.where(do, val, a[idx]))

        s2 = dict(s)
        s2["feature"] = upd(s["feature"], l, fl)
        s2["split_bin"] = upd(s["split_bin"], l, bl)
        s2["default_left"] = upd(s["default_left"], l, dll)
        s2["is_leaf"] = upd(s["is_leaf"], l, False)
        s2["left"] = upd(s["left"], l, li)
        s2["right"] = upd(s["right"], l, ri)
        child_depth = s["depth"][l] + 1
        s2["depth"] = upd(upd(s["depth"], li, child_depth), ri, child_depth)
        s2["gain_pf"] = s["gain_pf"].at[fl].add(jnp.where(do, s["bg"][l], 0.0))

        # route the chosen leaf's rows
        at_l = (s["node"] == l) & do
        bv = binned_T[fl]  # [N]
        go_left = jnp.where(bv == missing_id, dll, bv <= bl)
        s2["node"] = jnp.where(at_l, jnp.where(go_left, li, ri), s["node"])

        # child histograms + best splits (2 nodes)
        local = jnp.where(s2["node"] == ri, 1, 0)
        in_lvl = at_l
        hist = _build_level_hist(binned_T, grad, hess, local, in_lvl, 2,
                                 n_bins_tot, axis_name,
                                 use_pallas=p.use_pallas_hist)
        cg, cf, cb, cdl, cgt, cht = _best_splits(hist, col_mask, p)
        can_split = do & (child_depth < depth_cap)
        cg = jnp.where(can_split, cg, -jnp.inf)

        s2["node_g"] = upd(upd(s["node_g"], li, cgt[0]), ri, cgt[1])
        s2["node_h"] = upd(upd(s["node_h"], li, cht[0]), ri, cht[1])
        bg = s["bg"].at[l].set(jnp.where(do, -jnp.inf, s["bg"][l]))
        s2["bg"] = bg.at[li].set(cg[0]).at[ri].set(cg[1])
        s2["bf"] = upd(upd(s["bf"], li, cf[0]), ri, cf[1])
        s2["bb"] = upd(upd(s["bb"], li, cb[0]), ri, cb[1])
        s2["bdl"] = upd(upd(s["bdl"], li, cdl[0]), ri, cdl[1])
        s2["n_nodes"] = s["n_nodes"] + jnp.where(do, 2, 0)
        return s2, None

    state, _ = jax.lax.scan(split_step, state, None, length=L - 1)

    allocated = jnp.arange(M) < state["n_nodes"]
    lv = _leaf_weight(state["node_g"], state["node_h"],
                      p.reg_alpha, p.reg_lambda, p.learning_rate)
    leaf_value = jnp.where(state["is_leaf"] & allocated
                           & (state["node_h"] > 0), lv, 0.0)

    tree = (state["feature"], state["split_bin"], state["default_left"],
            state["is_leaf"], state["left"], state["right"], leaf_value)
    return tree, state["gain_pf"], state["node"]


def _predict_tree_lossguide(tree, binned, missing_id, n_steps):
    """Leaf value per row for one lossguide tree (pointer chasing)."""
    feature, split_bin, default_left, is_leaf, left, right, leaf_value = tree
    n = binned.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for _ in range(n_steps):
        feat = feature[node]
        bv = _gather_feature_values(binned, feat)
        is_missing = bv == missing_id
        go_left = jnp.where(is_missing, default_left[node], bv <= split_bin[node])
        child = jnp.where(go_left, left[node], right[node])
        node = jnp.where(is_leaf[node], node, child)
    return leaf_value[node]


def train_gbdt(
    X_train: np.ndarray,
    y_train: np.ndarray,
    params: GBDTParams = GBDTParams(),
    sample_weight: Optional[np.ndarray] = None,
    scale_pos_weight: float = 1.0,
    objective: Optional[Objective] = None,
    X_val: Optional[np.ndarray] = None,
    y_val: Optional[np.ndarray] = None,
    early_stopping_rounds: Optional[int] = None,
    bin_spec: Optional[BinSpec] = None,
    axis_name: Optional[str] = None,
    pad_rows_to: Optional[int] = None,
    pad_val_rows_to: Optional[int] = None,
    pad_features_to: Optional[int] = None,
) -> GBDTModel:
    """Fit a boosted-tree model. Host-facing wrapper around a fully-jitted
    scan; mirrors ``xgb.train`` with the reference's parameter surface.

    ``pad_rows_to`` / ``pad_val_rows_to`` pad the row axes with zero-weight
    (resp. metric-masked) rows so different CV folds share one compiled
    shape."""
    if objective is None:
        objective = objectives.logistic
    if params.num_class >= 2 and (params.grow_policy != "depthwise"
                                  or params.dart_rate > 0.0):
        raise ValueError("num_class >= 2 requires depthwise growth "
                         "without DART (XGBoost multi:softprob semantics)")

    # pad the feature axis with all-NaN (inert) columns so configs with
    # different feature counts share one compiled boosting graph; inert
    # columns can never split (their value bins are empty).
    n_feat_real = X_train.shape[1]
    pad_f = max(pad_features_to or 0, n_feat_real)
    if jax.default_backend() == "tpu":
        # feature axis to a 32 multiple: the histogram kernels tile
        # features in blocks of 32 (inert NaN columns can never split)
        pad_f = ((pad_f + 31) // 32) * 32
    if pad_f > n_feat_real:
        def _padf(M):
            extra = pad_f - M.shape[1]
            return np.concatenate(
                [np.asarray(M, np.float32),
                 np.full((len(M), extra), np.nan, np.float32)], axis=1)
        X_train = _padf(X_train)
        if X_val is not None:
            X_val = _padf(X_val)

    n_real = len(X_train)
    y = jnp.asarray(y_train, jnp.float32)
    w_base = (np.ones(n_real, np.float32) if sample_weight is None
              else np.asarray(sample_weight, np.float32))
    w = jnp.asarray(w_base) * jnp.where(y > 0.5, scale_pos_weight, 1.0)

    if bin_spec is None:
        # weight-aware quantile sketch (XGBoost semantics: DMatrix sample
        # weights shift the bin edges; scale_pos_weight does NOT — it only
        # enters the objective)
        bin_spec = fit_bins(np.asarray(X_train), params.n_bins,
                            sample_weight=w_base)

    binned = jnp.asarray(apply_bins_np(bin_spec, X_train))
    pad_rows = max(pad_rows_to or 0, n_real)
    if jax.default_backend() == "tpu":
        # round the row axis to a 512 multiple so the bin-lane histogram
        # kernel's row chunk tiles it exactly (padded rows are zero-weight)
        pad_rows = ((pad_rows + 511) // 512) * 512
    if pad_rows > n_real:
        extra = pad_rows - n_real
        binned = jnp.concatenate([binned, jnp.zeros((extra, binned.shape[1]), binned.dtype)])
        y = jnp.concatenate([y, jnp.zeros(extra, y.dtype)])
        w = jnp.concatenate([w, jnp.zeros(extra, w.dtype)])  # zero weight -> inert

    has_val = X_val is not None
    if has_val:
        n_val = len(X_val)
        binned_val = jnp.asarray(apply_bins_np(bin_spec, X_val))
        yv = jnp.asarray(y_val, jnp.float32)
        vmask = jnp.ones(n_val, bool)
        if pad_val_rows_to is not None and pad_val_rows_to > n_val:
            extra = pad_val_rows_to - n_val
            binned_val = jnp.concatenate(
                [binned_val, jnp.zeros((extra, binned_val.shape[1]), binned_val.dtype)])
            yv = jnp.concatenate([yv, jnp.zeros(extra, yv.dtype)])
            vmask = jnp.concatenate([vmask, jnp.zeros(extra, bool)])
    else:
        binned_val = binned[:1]
        yv = y[:1]
        vmask = jnp.ones(1, bool)

    # PRNG keys are a traced argument: changing the seed (e.g. the v104
    # seed ensemble) must NOT trigger a recompile of the boosting scan.
    keys = jax.random.split(jax.random.PRNGKey(params.seed), params.n_rounds)
    row_ids = jnp.arange(binned.shape[0], dtype=jnp.int32)
    # normalize the seed inside the static config so seed changes hit the
    # same compiled executable
    from mallorn_tpu.utils.aot_cache import call_cached

    forest, imp, hist, best_mv = call_cached(
        _fit_jit, (binned, y, w, row_ids, binned_val, yv, vmask, keys,
                   params._replace(seed=0), objective, has_val, axis_name,
                   int(early_stopping_rounds or 0)),
        tag="gbdt_fit", static_argnums=(8, 9, 10, 11, 12))

    best_it = -1
    val_margin = None
    if has_val:
        h = np.asarray(hist)
        if early_stopping_rounds:
            best, best_i = np.inf, 0
            stop = len(h)
            for i, v in enumerate(h):
                if v < best:
                    best, best_i = v, i
                elif i - best_i >= early_stopping_rounds:
                    stop = i
                    break
            best_it = best_i
            mv = np.asarray(best_mv)[..., :n_val]  # [K, nv] when multiclass
            if np.isfinite(mv).all():
                val_margin = mv
        else:
            best_it = int(np.argmin(h))

    return GBDTModel(forest=forest, bin_spec=bin_spec, params=params,
                     importance_gain=imp[:n_feat_real], eval_history=hist,
                     best_iteration=best_it, val_margin=val_margin)


def _fit_impl(binned, y, w, row_ids, binned_val, yv, vmask, keys,
              params: GBDTParams, objective, has_val: bool, axis_name,
              early_stop: int = 0):
    binned = binned.astype(jnp.int32)
    binned_val = binned_val.astype(jnp.int32)
    n, n_f = binned.shape
    depth = params.max_depth
    missing_id = params.n_bins
    binned_T = binned.T  # [F, N]
    lossguide = params.grow_policy == "lossguide"
    symmetric = params.grow_policy == "symmetric"
    lg_steps = min(params.max_depth if params.max_depth > 0 else
                   params.max_leaves, params.max_leaves)

    k_cols = max(1, int(round(params.colsample_bytree * n_f)))

    use_binlane = params.use_binlane_hist
    if use_binlane is None:
        use_binlane = jax.default_backend() == "tpu"
    # cap 2048: at the adversarial shape (8192 rows) rc=2048 measured 4.36 ms
    # vs 5.54 ms at rc=1024 for the level-0 call (tools/probe_sweep.json)
    bl_rc = _pick_row_chunk(n, cap=2048)
    use_binlane = use_binlane and not lossguide and bl_rc >= 256
    if use_binlane:
        if params.hist_dtype == "i8full":
            # full-bin int8 one-hot stream: the node-side matrix becomes
            # feature-independent, deleting the per-feature VPU
            # compare+select that binds the 128-lane kernels
            bl_bhot = hist_pallas.precompute_fullhot_i8(
                binned_T, params.n_bins + 1)
            bl_hib = None
        elif params.hist_dtype in ("int8", "i8bf16"):
            # i8bf16: int8 one-hot stream (half HBM), converted to bf16
            # in-kernel, bf16 MXU matmuls (measured: the pure-int8 dot
            # path is NOT faster on this Mosaic version)
            bl_bhot, bl_hib = hist_pallas.precompute_binlane_i8(binned_T)
        else:
            bl_bhot, bl_hib = hist_pallas.precompute_binlane(binned_T)

    n_class = int(params.num_class)
    multiclass = n_class >= 2

    def _col_mask(k_col):
        if params.colsample_bytree < 1.0:
            perm = jax.random.permutation(k_col, n_f)
            return jnp.zeros(n_f, bool).at[perm[:k_cols]].set(True)
        return jnp.ones(n_f, bool)

    def _binlane_for(grad, hess):
        if not use_binlane:
            return None
        if params.hist_dtype == "int8":
            return ("int8", bl_bhot, bl_hib,
                    hist_pallas.quantize_gh_i8(grad, hess), bl_rc)
        if params.hist_dtype == "i8full":
            return ("i8full", bl_bhot, None,
                    hist_pallas.split_gh_digits8(grad, hess), bl_rc)
        # "bf16" / "i8bf16" share the bf16-digit kernel
        return ("bf16", bl_bhot, bl_hib,
                hist_pallas.split_gh_digits(grad, hess), bl_rc)

    def _val_metric(margin_val):
        """Masked, mesh-global validation metric (params.eval_metric)."""
        eps = 1e-16
        den = _psum(jnp.sum(vmask.astype(jnp.float32)), axis_name)
        if multiclass:
            # mlogloss: -log softmax(margin)[y]
            logp = jax.nn.log_softmax(margin_val, axis=0)  # [K, Nv]
            yk = yv.astype(jnp.int32)[None, :] == jnp.arange(n_class)[:, None]
            ll = -jnp.sum(jnp.where(yk, logp, 0.0), axis=0)
            return _psum(jnp.sum(jnp.where(vmask, ll, 0.0)), axis_name) / den
        if params.eval_metric == "rmse":
            se = jnp.where(vmask, (margin_val - yv) ** 2, 0.0)
            return jnp.sqrt(_psum(jnp.sum(se), axis_name) / den)
        p = jax.nn.sigmoid(margin_val)
        ll = -(yv * jnp.log(jnp.clip(p, eps, 1.0))
               + (1 - yv) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
        return _psum(jnp.sum(jnp.where(vmask, ll, 0.0)), axis_name) / den

    def round_step(carry, rkey):
        margin, margin_val = carry
        k_sub, k_col = jax.random.split(rkey)

        if multiclass:
            # XGBoost SoftmaxMultiClassObj: shared row subsample per
            # iteration, fresh column sample per class tree
            p = jax.nn.softmax(margin, axis=0)  # [K, N]
            yk = (y.astype(jnp.int32)[None, :]
                  == jnp.arange(n_class)[:, None]).astype(jnp.float32)
            grad_all = w[None, :] * (p - yk)
            hess_all = w[None, :] * jnp.maximum(2.0 * p * (1.0 - p), 1e-16)
            if params.subsample < 1.0:
                m = _row_subsample_mask(k_sub, row_ids, params.subsample)
                grad_all = jnp.where(m[None, :], grad_all, 0.0)
                hess_all = jnp.where(m[None, :], hess_all, 0.0)
            kcols = jax.random.split(k_col, n_class)

            class_trees, class_gains, mv_add = [], [], 0.0
            for k in range(n_class):  # static unroll: K trees per round
                tree_k, gains_k, node_k = _train_tree(
                    binned_T, binned, grad_all[k], hess_all[k],
                    _col_mask(kcols[k]), params, axis_name,
                    symmetric=symmetric,
                    binlane=_binlane_for(grad_all[k], hess_all[k]))
                margin = margin.at[k].add(tree_k[4][node_k])
                class_trees.append(tree_k)
                class_gains.append(gains_k)
                if has_val:
                    mv_add = _predict_tree(tree_k, binned_val, missing_id,
                                           depth + 1)
                    margin_val = margin_val.at[k].add(mv_add)
            tree = tuple(jnp.stack([ct[i] for ct in class_trees])
                         for i in range(5))  # each [K, ...]
            gains = sum(class_gains)
            metric = _val_metric(margin_val) if has_val else jnp.nan
            return (margin, margin_val), (tree, gains, metric)

        grad, hess = objective(margin, y, w)
        if params.subsample < 1.0:
            m = _row_subsample_mask(k_sub, row_ids, params.subsample)
            grad = jnp.where(m, grad, 0.0)
            hess = jnp.where(m, hess, 0.0)

        col_mask = _col_mask(k_col)
        binlane = _binlane_for(grad, hess)

        if lossguide:
            tree, gains, node_assign = _train_tree_lossguide(
                binned_T, binned, grad, hess, col_mask, params, axis_name)
            leaf_value = tree[6]
        else:
            tree, gains, node_assign = _train_tree(
                binned_T, binned, grad, hess, col_mask, params, axis_name,
                symmetric=symmetric, binlane=binlane)
            leaf_value = tree[4]

        margin = margin + leaf_value[node_assign]
        if has_val:
            if lossguide:
                margin_val = margin_val + _predict_tree_lossguide(
                    tree, binned_val, missing_id, lg_steps)
            else:
                margin_val = margin_val + _predict_tree(tree, binned_val, missing_id, depth + 1)
            metric = _val_metric(margin_val)
        else:
            metric = jnp.nan

        return (margin, margin_val), (tree, gains, metric)

    if params.dart_rate > 0.0:
        return _fit_dart(binned, binned_T, y, w, row_ids, binned_val, yv,
                         vmask, params, objective, has_val, axis_name, keys,
                         k_cols, n_f, depth, missing_id)

    if has_val and early_stop > 0:
        # device-side early stopping: a while_loop that stops `early_stop`
        # rounds past the best validation logloss, instead of always
        # paying all n_rounds (XGBoost's early_stopping_rounds semantics;
        # the scan path cannot stop). Under vmap (batched folds) the loop
        # runs until EVERY fold has stopped — still a large saving, since
        # fold stop rounds are correlated. Unexecuted rounds keep +inf
        # metrics and all-zero trees (inert in prediction).
        R = params.n_rounds
        if lossguide:
            M = 2 * params.max_leaves - 1
            bufs0 = (jnp.zeros((R, M), jnp.int32), jnp.full((R, M), -1, jnp.int32),
                     jnp.zeros((R, M), bool), jnp.ones((R, M), bool),
                     jnp.zeros((R, M), jnp.int32), jnp.zeros((R, M), jnp.int32),
                     jnp.zeros((R, M), jnp.float32))
        elif multiclass:
            n_int = 2 ** depth - 1
            n_heap = 2 ** (depth + 1) - 1
            bufs0 = (jnp.zeros((R, n_class, n_int), jnp.int32),
                     jnp.full((R, n_class, n_int), -1, jnp.int32),
                     jnp.zeros((R, n_class, n_int), bool),
                     jnp.zeros((R, n_class, n_int), bool),
                     jnp.zeros((R, n_class, n_heap), jnp.float32))
        else:
            n_int = 2 ** depth - 1
            n_heap = 2 ** (depth + 1) - 1
            bufs0 = (jnp.zeros((R, n_int), jnp.int32),
                     jnp.full((R, n_int), -1, jnp.int32),
                     jnp.zeros((R, n_int), bool), jnp.zeros((R, n_int), bool),
                     jnp.zeros((R, n_heap), jnp.float32))

        def cond(state):
            i, _, _, _, best_i, *_ = state
            return (i < R) & (i - best_i <= early_stop)

        def body(state):
            (i, margin, margin_val, best_m, best_i, bufs, gain_sum, metrics,
             best_mv, stopped) = state
            (margin, margin_val), (tree, gains, metric) = round_step(
                (margin, margin_val), keys[i])
            bufs = tuple(b.at[i].set(t) for b, t in zip(bufs, tree))
            metrics = metrics.at[i].set(metric)
            # XGBoost first-stop semantics, frozen per lane: under vmap
            # the batched loop keeps executing lanes whose own fold has
            # already stopped (it runs until EVERY lane's cond is false);
            # a later metric dip in such a lane must NOT move its best —
            # the host-side scan in _models_from_folds breaks at the
            # first stop, and best_mv must match the best_iteration it
            # reports.
            better = (metric < best_m) & jnp.logical_not(stopped)
            stopped = stopped | (jnp.logical_not(better)
                                 & (i - best_i >= early_stop))
            best_m = jnp.where(better, metric, best_m)
            best_i = jnp.where(better, i, best_i)
            best_mv = jnp.where(better, margin_val, best_mv)
            return (i + 1, margin, margin_val, best_m, best_i, bufs,
                    gain_sum + gains, metrics, best_mv, stopped)

        nv = binned_val.shape[0]
        m0 = (jnp.full((n_class, n), params.base_score, jnp.float32)
              if multiclass else jnp.full(n, params.base_score, jnp.float32))
        mv0 = (jnp.full((n_class, nv), params.base_score, jnp.float32)
               if multiclass else jnp.full(nv, params.base_score, jnp.float32))
        state0 = (jnp.asarray(0), m0, mv0,
                  jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0),
                  bufs0, jnp.zeros(n_f, jnp.float32),
                  jnp.full(R, jnp.inf, jnp.float32),
                  jnp.zeros_like(mv0),
                  jnp.asarray(False))
        (*_, bufs, gain_sum, metrics, best_mv, _stopped) = jax.lax.while_loop(
            cond, body, state0)
        forest = LGForest(*bufs) if lossguide else Forest(*bufs)
        return forest, gain_sum, metrics, best_mv

    nv = binned_val.shape[0]
    m0 = (jnp.full((n_class, n), params.base_score, jnp.float32)
          if multiclass else jnp.full(n, params.base_score, jnp.float32))
    mv0 = (jnp.full((n_class, nv), params.base_score, jnp.float32)
           if multiclass else jnp.full(nv, params.base_score, jnp.float32))
    _, (trees, gains, metrics) = jax.lax.scan(round_step, (m0, mv0), keys)

    forest = LGForest(*trees) if lossguide else Forest(*trees)
    # no early stopping: best-iteration selection happens post-hoc on
    # host; callers fall back to an explicit predict for val margins
    return (forest, jnp.sum(gains, axis=0), metrics,
            jnp.full_like(mv0, jnp.nan))


def _fit_dart(binned, binned_T, y, w, row_ids, binned_val, yv, vmask, params,
              objective, has_val, axis_name, keys, k_cols, n_f, depth,
              missing_id):
    """DART boosting: per-tree contribution matrices + a running scale
    vector; margins are scale-weighted sums over trees."""
    R = params.n_rounds
    n = binned.shape[0]
    nv = binned_val.shape[0]
    lossguide = params.grow_policy == "lossguide"
    symmetric = params.grow_policy == "symmetric"
    lg_steps = min(params.max_depth if params.max_depth > 0 else
                   params.max_leaves, params.max_leaves)

    def round_step(carry, inp):
        c_train, c_val, scale, r = carry
        rkey = inp
        k_drop, k_sub, k_col = jax.random.split(rkey, 3)

        prev = jnp.arange(R) < r
        drop = prev & (jax.random.uniform(k_drop, (R,)) < params.dart_rate)
        k = jnp.sum(drop).astype(jnp.float32)
        keep_scale = jnp.where(drop, 0.0, scale)
        margin = keep_scale @ c_train + params.base_score

        grad, hess = objective(margin, y, w)
        if params.subsample < 1.0:
            m = _row_subsample_mask(k_sub, row_ids, params.subsample)
            grad = jnp.where(m, grad, 0.0)
            hess = jnp.where(m, hess, 0.0)
        if params.colsample_bytree < 1.0:
            perm = jax.random.permutation(k_col, n_f)
            col_mask = jnp.zeros(n_f, bool).at[perm[:k_cols]].set(True)
        else:
            col_mask = jnp.ones(n_f, bool)

        if lossguide:
            tree, gains, node_assign = _train_tree_lossguide(
                binned_T, binned, grad, hess, col_mask, params, axis_name)
            leaf_value = tree[6]
        else:
            tree, gains, node_assign = _train_tree(
                binned_T, binned, grad, hess, col_mask, params, axis_name,
                symmetric=symmetric)
            leaf_value = tree[4]

        # DART normalization
        scale = jnp.where(drop, scale * k / (k + 1.0), scale)
        scale = scale.at[r].set(1.0 / (k + 1.0))
        c_train = c_train.at[r].set(leaf_value[node_assign])
        if has_val:
            pv = (_predict_tree_lossguide(tree, binned_val, missing_id, lg_steps)
                  if lossguide else
                  _predict_tree(tree, binned_val, missing_id, depth + 1))
            c_val = c_val.at[r].set(pv)
            full_val = scale @ c_val + params.base_score
            p = jax.nn.sigmoid(full_val)
            eps = 1e-16
            ll = -(yv * jnp.log(jnp.clip(p, eps, 1.0))
                   + (1 - yv) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
            ll = jnp.where(vmask, ll, 0.0)
            metric = _psum(jnp.sum(ll), axis_name) / _psum(
                jnp.sum(vmask.astype(jnp.float32)), axis_name)
        else:
            metric = jnp.nan

        return (c_train, c_val, scale, r + 1), (tree, gains, metric)

    init = (jnp.zeros((R, n), jnp.float32), jnp.zeros((R, nv), jnp.float32),
            jnp.zeros(R, jnp.float32), jnp.asarray(0))
    (_, _, scale, _), (trees, gains, metrics) = jax.lax.scan(
        round_step, init, keys)

    # fold the final scales into the stored leaf values so prediction is
    # a plain scaled-forest sum
    if lossguide:
        forest = LGForest(*trees[:6], leaf_value=trees[6] * scale[:, None])
    else:
        forest = Forest(*trees[:4], leaf_value=trees[4] * scale[:, None])
    # DART re-scales past trees every round: "margins at best iteration"
    # is not a prefix of a fixed forest, so no val_margin shortcut
    return (forest, jnp.sum(gains, axis=0), metrics,
            jnp.full(nv, jnp.nan, jnp.float32))


def _stack_folds(folds, params: GBDTParams, pad_rows_to, pad_val_rows_to,
                 pad_features_to):
    """Pad every fold to shared shapes and stack on a leading fold axis.

    Returns (arrs dict incl. row_ids, bin specs, n_feat_real)."""
    import os as _os
    import time as _time
    _timers = _os.environ.get("MALLORN_TIMERS")
    _t_bins = _t_apply = 0.0
    _t0 = _time.perf_counter()
    stacks = {k: [] for k in ("binned", "y", "w", "binned_val", "yv", "vmask", "keys")}

    # shared-sort binning: when every fold is a row-subset of ONE parent
    # matrix (the K-fold CV case), per-fold quantile edges come from a
    # single global per-column sort instead of K fresh sorts — exactly
    # equal edges (test_fit_bins_folds_equals_per_fold), ~3x cheaper on
    # this 1-core host (binning was ~3 s of the adversarial stage)
    shared_specs = None
    parents = [f.get("X_parent") for f in folds]
    idxs = [f.get("tr_idx") for f in folds]
    if (all(p is not None for p in parents)
            and all(i is not None for i in idxs)
            and all(p is parents[0] for p in parents)
            and all(len(np.unique(i)) == len(i) for i in idxs)):
        from mallorn_tpu.trees.binning import fit_bins_folds

        _tb0 = _time.perf_counter()
        Xp = np.asarray(parents[0], np.float32)
        if pad_features_to and pad_features_to > Xp.shape[1]:
            ext = pad_features_to - Xp.shape[1]
            Xp = np.concatenate(
                [Xp, np.full((len(Xp), ext), np.nan, np.float32)], 1)
        w_bases = [np.ones(len(i), np.float32) if f.get("w") is None
                   else np.asarray(f["w"], np.float32)
                   for f, i in zip(folds, idxs)]
        shared_specs = fit_bins_folds(Xp, idxs, params.n_bins,
                                      sample_weights=w_bases)
        _t_bins += _time.perf_counter() - _tb0

    # device fold binning: with a shared parent and per-fold row indices,
    # the per-fold row gather + searchsorted + host->device ship of the
    # binned stacks (1.5-10 s of host time per stage on the benchmark's
    # 1-core host, CPU-steal dependent) collapses to ONE parent-matrix
    # transfer + a compare-reduce kernel. apply_bins_folds_gather is
    # pinned bit-equal to the host path, so the fold-fit executables see
    # identical inputs either way.
    use_dev = (shared_specs is not None
               and all(f.get("va_idx") is not None for f in folds)
               and (jax.default_backend() == "tpu"
                    # test hook: exercise this path on CPU
                    or _os.environ.get("MALLORN_DEVICE_STACK") == "1"))

    specs = []
    for fi, f in enumerate(folds):
        y_f = np.asarray(f["y"], np.float32)
        yv_f = np.asarray(f["y_val"], np.float32)
        n_tr, n_va = len(y_f), len(yv_f)
        w_base = f.get("w")
        w_base = (np.ones(len(y_f), np.float32) if w_base is None
                  else np.asarray(w_base, np.float32))
        # sketch from DMatrix-style weights only; scale_pos_weight enters
        # the objective, not the bin edges (XGBoost semantics)
        w = w_base * np.where(y_f > 0.5, f.get("spw", 1.0), 1.0)

        if use_dev:
            specs.append(shared_specs[fi])
        else:
            X = np.asarray(f["X"], np.float32)
            Xv = np.asarray(f["X_val"], np.float32)
            if pad_features_to and pad_features_to > X.shape[1]:
                ext = pad_features_to - X.shape[1]
                X = np.concatenate(
                    [X, np.full((len(X), ext), np.nan, np.float32)], 1)
                Xv = np.concatenate(
                    [Xv, np.full((len(Xv), ext), np.nan, np.float32)], 1)

            _tb = _time.perf_counter()
            spec = (shared_specs[fi] if shared_specs is not None
                    else fit_bins(X, params.n_bins, sample_weight=w_base))
            specs.append(spec)
            _ta = _time.perf_counter()
            _t_bins += _ta - _tb

            binned = apply_bins_np(spec, X)
            binned_val = apply_bins_np(spec, Xv)
            _t_apply += _time.perf_counter() - _ta

        er, ev = pad_rows_to - n_tr, pad_val_rows_to - n_va
        if use_dev:
            stacks["y"].append(np.concatenate([y_f, np.zeros(er, np.float32)]))
            stacks["w"].append(np.concatenate([w, np.zeros(er, np.float32)]))
            stacks["yv"].append(np.concatenate([yv_f, np.zeros(ev, np.float32)]))
            stacks["vmask"].append(np.concatenate(
                [np.ones(n_va, bool), np.zeros(ev, bool)]))
            stacks["keys"].append(np.asarray(jax.random.split(
                jax.random.PRNGKey(f.get("seed", params.seed)), params.n_rounds)))
            continue
        stacks["binned"].append(np.concatenate(
            [binned, np.zeros((er, binned.shape[1]), binned.dtype)]))
        stacks["y"].append(np.concatenate([y_f, np.zeros(er, np.float32)]))
        stacks["w"].append(np.concatenate([w, np.zeros(er, np.float32)]))
        stacks["binned_val"].append(np.concatenate(
            [binned_val, np.zeros((ev, binned_val.shape[1]), binned_val.dtype)]))
        stacks["yv"].append(np.concatenate([yv_f, np.zeros(ev, np.float32)]))
        stacks["vmask"].append(np.concatenate(
            [np.ones(len(Xv), bool), np.zeros(ev, bool)]))
        stacks["keys"].append(np.asarray(jax.random.split(
            jax.random.PRNGKey(f.get("seed", params.seed)), params.n_rounds)))

    _tp = _time.perf_counter()
    arrs = {k: jnp.asarray(np.stack(v)) for k, v in stacks.items() if v}
    if use_dev:
        _ta = _time.perf_counter()
        from mallorn_tpu.trees.binning import apply_bins_folds_gather
        from mallorn_tpu.utils.aot_cache import call_cached

        k_f = len(folds)
        # one [K, R + RV] index stack -> one executable per stage shape
        idx_all = np.full((k_f, pad_rows_to + pad_val_rows_to), -1, np.int32)
        for k, f in enumerate(folds):
            ti = np.asarray(f["tr_idx"], np.int32)
            vi = np.asarray(f["va_idx"], np.int32)
            idx_all[k, : len(ti)] = ti
            idx_all[k, pad_rows_to: pad_rows_to + len(vi)] = vi
        edges = jnp.stack([s.edges for s in specs])  # [K, F, n_bins-1]
        Xp_d = jnp.asarray(Xp)
        fn = jax.jit(apply_bins_folds_gather, static_argnums=(3,))
        binned_all = call_cached(
            fn, (Xp_d, edges, jnp.asarray(idx_all), params.n_bins),
            tag="gbdt_stackbin", static_argnums=(3,))
        arrs["binned"] = binned_all[:, :pad_rows_to]
        arrs["binned_val"] = binned_all[:, pad_rows_to:]
        _t_apply += _time.perf_counter() - _ta
    arrs["row_ids"] = jnp.broadcast_to(
        jnp.arange(pad_rows_to, dtype=jnp.int32), (len(folds), pad_rows_to))
    n_feat_real = np.asarray(folds[0]["X"], np.float32).shape[1]
    if _timers:
        print(f"      [stack] bins={_t_bins:.2f}s apply={_t_apply:.2f}s "
              f"pad={_tp - _t0 - _t_bins - _t_apply:.2f}s "
              f"put={_time.perf_counter() - _tp:.2f}s", flush=True)
    return arrs, specs, n_feat_real


def _models_from_folds(forests, imps, hists, specs, params, n_feat_real,
                       early_stopping_rounds, best_mvs=None):
    models = []
    h_all = np.asarray(hists)
    mv_all = None if best_mvs is None else np.asarray(best_mvs)
    for i in range(len(specs)):
        best_it = -1
        h = h_all[i]
        val_margin = None
        if early_stopping_rounds:
            best, best_i = np.inf, 0
            for j, v in enumerate(h):
                if v < best:
                    best, best_i = v, j
                elif j - best_i >= early_stopping_rounds:
                    break
            best_it = best_i
            if mv_all is not None and np.isfinite(mv_all[i]).all():
                val_margin = mv_all[i]
        else:
            best_it = int(np.argmin(h))
        forest_i = (LGForest if len(forests) == 7 else Forest)(
            *[a[i] for a in forests])
        models.append(GBDTModel(
            forest=forest_i, bin_spec=specs[i], params=params,
            importance_gain=imps[i][:n_feat_real], eval_history=hists[i],
            best_iteration=best_it, val_margin=val_margin))
    return models


def train_gbdt_folds(
    folds,  # sequence of dicts: X, y, w(opt), X_val, y_val, spw
    params: GBDTParams,
    objective: Optional[Objective] = None,
    early_stopping_rounds: Optional[int] = None,
    pad_rows_to: Optional[int] = None,
    pad_val_rows_to: Optional[int] = None,
    pad_features_to: Optional[int] = None,
):
    """Train all CV folds as ONE vmapped computation.

    Folds are padded to shared shapes and stacked on a leading fold axis;
    ``jax.vmap(_fit_jit)`` then runs them concurrently — one compile, one
    device dispatch for the whole CV (compile time dominates on the
    remote-compile tunnel, and a single fold underutilizes the chip).
    Returns a list of GBDTModel, one per fold.
    """
    if objective is None:
        objective = objectives.logistic

    pad_rows_to = pad_rows_to or max(len(f["X"]) for f in folds)
    pad_val_rows_to = pad_val_rows_to or max(len(f["X_val"]) for f in folds)
    f_real_max = max(np.asarray(f["X"]).shape[1] for f in folds)
    pad_features_to = max(pad_features_to or 0, f_real_max)
    if jax.default_backend() == "tpu":
        pad_features_to = ((pad_features_to + 31) // 32) * 32
        # row axis to a 512 multiple: the bin-lane histogram kernel's row
        # chunk must tile it exactly (padded rows are zero-weight)
        pad_rows_to = ((pad_rows_to + 511) // 512) * 512
        if params.grow_policy == "lossguide":
            # the leaf-wise fit never uses the binlane kernels (it
            # histograms per leaf via the one-hot kernel), so the
            # binlane HBM gate below would mis-size its groups: cap at
            # the one-hot path's verified-good vmap lane count (a
            # 25-lane [seeds x folds] lossguide fit — the kaggle
            # ensemble's v114d member — faulted the TPU worker)
            if len(folds) > _MAX_VMAP_LANES_LOSSGUIDE:
                return _train_folds_grouped(
                    folds, params, objective, early_stopping_rounds,
                    pad_rows_to, pad_val_rows_to, pad_features_to,
                    _MAX_VMAP_LANES_LOSSGUIDE)
        elif params.use_binlane_hist is None:
            # HBM gate: the precomputed [F, N, 128] bin-lane one-hot costs
            # 256 B (bf16) / 128 B (int8) per (lane, feature, row). A
            # many-lane fit (e.g. the 50-lane [seeds x folds] v104
            # ensemble) is SPLIT into sequential lane groups that each fit
            # the binlane budget, instead of falling back to the per-level
            # one-hot kernel: grouped binlane is ~5x faster per level, and
            # the one-hot path deterministically faults the TPU worker
            # under >=20-lane vmap (tools/probe_onehot_*.py bisect; the
            # isolated kernel passes — a Mosaic scan+vmap interaction).
            if params.hist_dtype == "i8full":
                bpe = ((params.n_bins + 1 + 127) // 128) * 128  # full one-hot
            elif params.hist_dtype in ("int8", "i8bf16"):
                bpe = 128
            else:
                bpe = 256
            per_lane = pad_features_to * pad_rows_to * bpe
            budget = 5.5e9
            # Lane-count ceiling, independent of HBM: vmapped fits above
            # ~20 lanes deterministically fault the TPU worker even when
            # the binlane tensor fits (50-lane binlane crashes, 20-lane
            # binlane verified good end-to-end; the one-hot kernel faults
            # at 20 and is good at 10 — tools/probe_v104_bisect.py).
            g_cap = min(int(budget // per_lane), _MAX_VMAP_LANES_BINLANE)
            if g_cap >= 1:
                if g_cap < len(folds):
                    return _train_folds_grouped(
                        folds, params, objective, early_stopping_rounds,
                        pad_rows_to, pad_val_rows_to, pad_features_to,
                        g_cap)
            else:
                params = params._replace(use_binlane_hist=False)
                if len(folds) > _MAX_VMAP_LANES_ONEHOT:
                    return _train_folds_grouped(
                        folds, params, objective, early_stopping_rounds,
                        pad_rows_to, pad_val_rows_to, pad_features_to,
                        _MAX_VMAP_LANES_ONEHOT)
    import os as _os
    import time as _time

    _timers = _os.environ.get("MALLORN_TIMERS")
    _t0 = _time.perf_counter()
    arrs, specs, n_feat_real = _stack_folds(
        folds, params, pad_rows_to, pad_val_rows_to, pad_features_to)

    from mallorn_tpu.utils.aot_cache import call_cached

    p_static = params._replace(seed=0)
    es = int(early_stopping_rounds or 0)
    fit_v = _folds_executable(p_static, objective, True, None, es)
    _t1 = _time.perf_counter()
    forests, imps, hists, best_mvs = call_cached(
        fit_v, (arrs["binned"], arrs["y"], arrs["w"], arrs["row_ids"],
                arrs["binned_val"], arrs["yv"], arrs["vmask"], arrs["keys"]),
        tag=_folds_cache_tag(p_static, objective, es))
    _t2 = _time.perf_counter()
    out = _models_from_folds(forests, imps, hists, specs, params,
                             n_feat_real, early_stopping_rounds,
                             best_mvs=best_mvs)
    if _timers:
        print(f"      [folds] stack={_t1 - _t0:.2f}s "
              f"dispatch={_t2 - _t1:.2f}s "
              f"models={_time.perf_counter() - _t2:.2f}s", flush=True)
    return out


# Verified-good vmap lane counts on real TPU (tools/probe_v104_bisect.py):
# 20-lane binlane fits run clean, 50-lane binlane faults the worker;
# 10-lane one-hot is clean, 20-lane one-hot faults. The fault is a Mosaic
# scan+vmap interaction (isolated kernels pass at any lane count).
_MAX_VMAP_LANES_BINLANE = 20
_MAX_VMAP_LANES_ONEHOT = 10
# leaf-wise fits are more fragile under vmap than the depthwise one-hot
# path: a 10-lane lossguide group at the kaggle-ensemble shape ran to
# completion but the NEXT group faulted the worker (round 5); 5 lanes is
# the CLI-proven v110/v111 width.
_MAX_VMAP_LANES_LOSSGUIDE = 5


def _train_folds_grouped(folds, params, objective, early_stopping_rounds,
                         pad_rows_to, pad_val_rows_to, pad_features_to,
                         g_cap: int):
    """Sequential equal-size lane groups, each under the binlane budget.

    Group count = ceil(L / g_cap); every group is dup-padded to the same
    lane count (repeating the last fold) so ALL groups share ONE compiled
    executable; the duplicate models are dropped. Lanes are independent
    under vmap, so grouping is bit-exact vs a single dispatch.
    """
    L = len(folds)
    n_groups = -(-L // g_cap)
    gsize = -(-L // n_groups)
    folds = list(folds) + [folds[-1]] * (n_groups * gsize - L)
    models = []
    for i in range(0, len(folds), gsize):
        models.extend(train_gbdt_folds(
            folds[i:i + gsize], params, objective=objective,
            early_stopping_rounds=early_stopping_rounds,
            pad_rows_to=pad_rows_to, pad_val_rows_to=pad_val_rows_to,
            pad_features_to=pad_features_to))
    return models[:L]


def _folds_cache_tag(params: GBDTParams, objective, early_stop: int) -> str:
    """AOT-cache tag for the fold-vmapped fit.

    The static config (params, objective, early_stop) is CLOSED OVER by
    the vmapped executable, not a traced argument — it must be part of the
    cache key, or two same-shaped fits with e.g. different grow_policy
    silently share one executable (wrong model family)."""
    from mallorn_tpu.utils.aot_cache import config_digest

    obj_key = getattr(objective, "_cache_key",
                      getattr(objective, "__qualname__", repr(objective)))
    return f"gbdt_folds_{config_digest(params._replace(seed=0), obj_key, int(early_stop))}"


_fit_jit = functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12))(_fit_impl)


@functools.lru_cache(maxsize=None)
def _folds_executable(params: GBDTParams, objective, has_val: bool, axis_name,
                      early_stop: int = 0):
    """Cached jitted vmap of the boosting scan over a leading fold axis.

    Must be cached by the static config: rebuilding the vmap wrapper per
    call would re-trace (and off the jit cache, re-compile) every time —
    e.g. once per seed in the v104 ensemble."""

    def one(b, y_, w_, rid, bv, yv_, vm, ks):
        return _fit_impl(b, y_, w_, rid, bv, yv_, vm, ks, params, objective,
                         has_val, axis_name, early_stop)

    return jax.jit(jax.vmap(one))


_PREDICT_GROUP = 10  # trees per scan step: a per-tree scan is
# iteration-overhead-bound on TPU (~500 tiny steps); grouping unrolls
# G trees per step for ~G x fewer scan iterations at equal flops


def _grouped_tree_scan(trees, n_total, step_fn, n0):
    """Scan over trees in groups of _PREDICT_GROUP. ``step_fn(tree, r)``
    returns the [N] contribution of one tree at global index r."""
    g = _PREDICT_GROUP
    r_pad = -(-n_total // g) * g
    if r_pad != n_total:
        trees = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((r_pad - n_total,) + a.shape[1:], a.dtype)]),
            trees)
    grouped = jax.tree.map(
        lambda a: a.reshape(r_pad // g, g, *a.shape[1:]), trees)

    def body(carry, inp):
        r0, margin = carry
        for j in range(g):
            tree = tuple(a[j] for a in inp)
            margin = margin + step_fn(tree, r0 + j)
        return (r0 + g, margin), None

    (_, margin), _ = jax.lax.scan(body, (jnp.asarray(0), n0), grouped)
    return margin


@functools.partial(jax.jit, static_argnums=(2,))
def _predict_margin_jit(forest, binned, cfg):
    binned = binned.astype(jnp.int32)
    missing_id, depth, n_trees, base_score = cfg
    lossguide = len(forest) == 7
    multiclass = forest[0].ndim == 3  # [R, K, ...] class-stacked trees

    trees = tuple(forest)
    if n_trees is not None:
        trees = jax.tree.map(lambda a: a[:n_trees], trees)
    r_total = trees[0].shape[0]

    if multiclass:
        n_class = trees[0].shape[1]

        def step(tree, r):  # tree arrays are [K, ...]; returns [N, K]
            return jnp.stack(
                [_predict_tree(tuple(a[k] for a in tree), binned,
                               missing_id, depth + 1)
                 for k in range(n_class)], axis=-1)

        n0 = jnp.full((binned.shape[0], n_class), base_score, jnp.float32)
        return _grouped_tree_scan(trees, r_total, step, n0)

    def step(tree, r):
        if lossguide:
            return _predict_tree_lossguide(tree, binned, missing_id, depth)
        return _predict_tree(tree, binned, missing_id, depth + 1)

    return _grouped_tree_scan(trees, r_total, step,
                              jnp.full(binned.shape[0], base_score,
                                       jnp.float32))


def predict_margin(model: GBDTModel, X: np.ndarray,
                   n_trees: Optional[int] = None) -> jnp.ndarray:
    """Raw margin. If the model early-stopped, uses best_iteration+1 trees
    (xgboost's ``predict`` semantics with early stopping)."""
    if n_trees is None and model.best_iteration >= 0:
        n_trees = model.best_iteration + 1
    X = np.asarray(X, np.float32)
    f_model = model.bin_spec.edges.shape[0]
    if X.shape[1] < f_model:  # model trained with inert feature padding
        X = np.concatenate(
            [X, np.full((len(X), f_model - X.shape[1]), np.nan, np.float32)],
            axis=1)
    binned = jnp.asarray(apply_bins_np(model.bin_spec, X))
    p = model.params
    if isinstance(model.forest, LGForest):
        route_depth = min(p.max_depth if p.max_depth > 0 else p.max_leaves,
                          p.max_leaves)
    else:
        route_depth = p.max_depth
    cfg = (p.n_bins, route_depth, n_trees, float(p.base_score))
    return _predict_margin_jit(model.forest, binned, cfg)


def predict_proba(model: GBDTModel, X: np.ndarray,
                  n_trees: Optional[int] = None) -> jnp.ndarray:
    """[N] sigmoid probabilities (binary), or [N, K] softmax (multiclass)."""
    m = predict_margin(model, X, n_trees)
    if model.params.num_class >= 2:
        return jax.nn.softmax(m, axis=-1)
    return jax.nn.sigmoid(m)


@functools.partial(jax.jit, static_argnums=(3,))
def _predict_margin_folds_jit(forests, binned, n_trees, cfg):
    binned = binned.astype(jnp.int32)
    missing_id, depth, base_score = cfg
    lossguide = len(forests) == 7
    multiclass = forests[0].ndim == 4  # [folds, R, K, ...]

    def one(forest, b, nt):
        trees = tuple(forest)

        if multiclass:
            n_class = trees[0].shape[1]

            def step(tree, r):  # [N, K]
                v = jnp.stack(
                    [_predict_tree(tuple(a[k] for a in tree), b,
                                   missing_id, depth + 1)
                     for k in range(n_class)], axis=-1)
                return jnp.where(r < nt, v, 0.0)

            n0 = jnp.full((b.shape[0], n_class), base_score, jnp.float32)
            return _grouped_tree_scan(trees, trees[0].shape[0], step, n0)

        def step(tree, r):
            if lossguide:
                v = _predict_tree_lossguide(tree, b, missing_id, depth)
            else:
                v = _predict_tree(tree, b, missing_id, depth + 1)
            # early-stopped models: trees past best_iteration are real
            # but must not contribute (xgboost predict semantics); padded
            # group slots are all-zero trees and contribute 0 either way
            return jnp.where(r < nt, v, 0.0)

        return _grouped_tree_scan(trees, trees[0].shape[0], step,
                                  jnp.full(b.shape[0], base_score,
                                           jnp.float32))

    return jax.vmap(one)(forests, binned, n_trees)


def predict_margin_folds(models, X) -> np.ndarray:
    """Margins for a list of same-config fold models as ONE vmapped
    dispatch (per-fold bin specs applied host-side).

    ``X`` is either one [N, F] matrix shared by every fold (test-set
    prediction) or a sequence of per-fold [N_i, F] matrices (OOF val
    prediction; ragged folds are padded to the longest and trimmed by the
    caller via the returned mask lengths). One [folds, N] batched forest
    scan instead of ``len(models)`` sequential 500-tree scans; per-fold
    best_iteration truncation is a traced mask so all folds share one
    executable. Returns [folds, N_max]."""
    m0 = models[0]
    f_model = m0.bin_spec.edges.shape[0]

    def prep(Xi):
        Xi = np.asarray(Xi, np.float32)
        if Xi.shape[1] < f_model:
            Xi = np.concatenate(
                [Xi, np.full((len(Xi), f_model - Xi.shape[1]), np.nan,
                             np.float32)], axis=1)
        return Xi

    if isinstance(X, np.ndarray) and X.ndim == 2:
        per_fold = [prep(X)] * len(models)
    else:
        per_fold = [prep(Xi) for Xi in X]
    n_max = max(len(Xi) for Xi in per_fold)
    binned = jnp.asarray(np.stack([
        np.concatenate([apply_bins_np(m.bin_spec, Xi),
                        np.zeros((n_max - len(Xi), f_model), np.int16)])
        for m, Xi in zip(models, per_fold)]))
    forests = jax.tree.map(lambda *a: jnp.stack(a),
                           *[tuple(m.forest) for m in models])
    n_trees = jnp.asarray(
        [(m.best_iteration + 1) if m.best_iteration >= 0
         else m.forest.feature.shape[0] for m in models], jnp.int32)
    p = m0.params
    if isinstance(m0.forest, LGForest):
        route_depth = min(p.max_depth if p.max_depth > 0 else p.max_leaves,
                          p.max_leaves)
    else:
        route_depth = p.max_depth
    from mallorn_tpu.utils.aot_cache import call_cached

    out = call_cached(
        _predict_margin_folds_jit,
        (tuple(forests), binned, n_trees,
         (p.n_bins, route_depth, float(p.base_score))),
        tag="gbdt_predict_folds", static_argnums=(3,))
    return np.asarray(out)


def predict_proba_folds(models, X: np.ndarray) -> np.ndarray:
    return np.asarray(jax.nn.sigmoid(jnp.asarray(predict_margin_folds(models, X))))
