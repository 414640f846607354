"""Property-based fuzz: GBDT-vs-oracle parity on adversarial data.

The fixed-fixture parity tests (test_gbdt.py) pin one data draw; here
hypothesis draws the DATA STRUCTURE — duplicate-heavy quantized columns,
constant and all-NaN columns, extreme magnitudes, zero sample weights,
class imbalance — and the device trainer must still match the loop-NumPy
f64 oracle. Shapes and params stay FIXED so the whole run pays exactly
one XLA compile.

Exact margin parity is NOT achievable on every draw: adversarial data
manufactures knife-edges — a split whose child hessian lands EXACTLY on
min_child_weight, or two (feature, bin) candidates with bit-identical
gains — where f32 (device) and f64 (oracle) legitimately resolve
differently. The acceptance criterion is therefore:

  margins allclose
  OR ( the FIRST structural divergence between the two forests is a
       provable knife-edge — both candidates' f64 gains equal within
       1e-3, or either candidate's min child hessian within 1e-3 of
       min_child_weight, or a leaf-vs-split flip at the min_split_gain /
       min_child_weight boundary —
       AND the final weighted train logloss matches within 0.02 ).

A real defect (wrong histogram, wrong NaN routing, wrong leaf values)
produces a non-knife-edge divergence or a degraded loss and still fails.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from mallorn_tpu.trees import GBDTParams, apply_bins, fit_bins, predict_margin, train_gbdt

N, F, BINS, ROUNDS, DEPTH = 160, 6, 32, 8, 3
LR, ALPHA, LAM, MCW, MSG = 0.15, 0.1, 1.0, 2.0, 1e-6

PARAMS = GBDTParams(n_rounds=ROUNDS, max_depth=DEPTH, learning_rate=LR,
                    subsample=1.0, colsample_bytree=1.0,
                    min_child_weight=MCW, reg_alpha=ALPHA, reg_lambda=LAM,
                    n_bins=BINS)

COLUMN_KINDS = ("normal", "quantized", "lowcard", "constant", "allnan",
                "extreme", "heavy_nan")


def _make_column(kind: str, rng: np.random.Generator, n: int) -> np.ndarray:
    if kind == "normal":
        return rng.normal(size=n)
    if kind == "quantized":  # many exact duplicates -> bin-edge ties
        return np.round(rng.normal(size=n) * 2.0) / 2.0
    if kind == "lowcard":  # 3 distinct values
        return rng.choice([-1.0, 0.0, 2.5], size=n)
    if kind == "constant":
        return np.full(n, 1.25)
    if kind == "allnan":
        return np.full(n, np.nan)
    if kind == "extreme":
        return rng.choice([1e-30, 1e30, -1e30, 0.0], size=n)
    if kind == "heavy_nan":
        c = rng.normal(size=n)
        c[rng.uniform(size=n) < 0.6] = np.nan
        return c
    raise AssertionError(kind)


@st.composite
def dataset(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    kinds = draw(st.lists(st.sampled_from(COLUMN_KINDS),
                          min_size=F, max_size=F))
    weight_kind = draw(st.sampled_from(["ones", "uniform", "zero_block"]))
    pos_frac = draw(st.floats(0.08, 0.5))

    rng = np.random.default_rng(seed)
    X = np.stack([_make_column(k, rng, N) for k in kinds], axis=1)
    # tiny per-column jitter reduces (but cannot eliminate — lowcard
    # columns can partition rows identically) cross-feature gain ties
    jitter = (np.arange(F) + 1) * 1e-6
    X = (X + jitter[None, :] * np.isfinite(X)).astype(np.float32)

    y = (rng.uniform(size=N) < pos_frac).astype(np.float32)
    if weight_kind == "ones":
        w = np.ones(N, np.float32)
    elif weight_kind == "uniform":
        w = rng.uniform(0.2, 3.0, size=N).astype(np.float32)
    else:  # a fifth of the rows inert
        w = np.ones(N, np.float32)
        w[: N // 5] = 0.0
    # keep the problem non-degenerate: >= 3 of each class with weight > 0
    live = np.flatnonzero(w > 0)
    y[live[:3]] = 1.0
    y[live[3:6]] = 0.0
    return X, y, w, kinds, weight_kind


# ----------------------------- knife-edge divergence analysis (f64)


def _node_rows(arrs, t, nid, binned):
    """Rows reaching heap node ``nid`` of OUR tree ``t`` (== the oracle's
    rows too: callers only use this at the FIRST divergent node, whose
    ancestors — all earlier in heap order — agreed)."""
    F_a, S_a, D_a, _ = arrs
    path = []
    while nid > 0:
        parent = (nid - 1) // 2
        path.append((parent, nid == 2 * parent + 1))
        nid = parent
    rows = np.arange(binned.shape[0])
    for parent, want_left in reversed(path):
        f, b, dl = F_a[t, parent], S_a[t, parent], bool(D_a[t, parent])
        bv = binned[rows, f]
        go_left = np.where(bv == BINS, dl, bv <= b)
        rows = rows[go_left == want_left]
    return rows


def _split_stats(rows, f, b, dl, binned, grad, hess):
    from tests.oracles.gbdt_oracle import score

    bv = binned[rows, f]
    left = (bv <= b) | ((bv == BINS) & dl)
    gl, hl = grad[rows][left].sum(), hess[rows][left].sum()
    g_tot, h_tot = grad[rows].sum(), hess[rows].sum()
    parent = score(g_tot, h_tot, ALPHA, LAM)
    gain = 0.5 * (score(gl, hl, ALPHA, LAM)
                  + score(g_tot - gl, h_tot - hl, ALPHA, LAM) - parent)
    return gain, min(hl, h_tot - hl)


def _first_divergence(model, oracle, binned):
    F_a = np.asarray(model.forest.feature)
    S_a = np.asarray(model.forest.split_bin)
    D_a = np.asarray(model.forest.default_left)
    L_a = np.asarray(model.forest.is_leaf)
    arrs = (F_a, S_a, D_a, L_a)
    for t, tree in enumerate(oracle.trees):
        for nid in range(2 ** DEPTH - 1):
            o = tree.get(nid)
            if o is None:
                continue
            ours_leaf = bool(L_a[t, nid])
            same = (o["leaf"] == ours_leaf and (o["leaf"] or (
                o["feature"] == F_a[t, nid] and o["bin"] == S_a[t, nid]
                and o["default_left"] == bool(D_a[t, nid]))))
            if not same:
                return t, nid, o, arrs
    return None


def _grads_logistic(oracle, t, binned, y, w):
    margin = np.zeros(len(y))
    for tt in range(t):
        margin += oracle._predict_tree(oracle.trees[tt], binned)
    prob = 1 / (1 + np.exp(-margin))
    return w * (prob - y), w * prob * (1 - prob)


def _grads_regression(oracle, t, binned, y, w):
    margin = np.full(len(y), oracle.base_score)
    for tt in range(t):
        margin += oracle._predict_tree(oracle.trees[tt], binned)
    return w * (margin - y), w.astype(np.float64).copy()


def _is_knife_edge(t, nid, o, arrs, binned, y, w, oracle, mcw=MCW,
                   grads_fn=_grads_logistic):
    """True when the first divergent node is a legitimate f32-vs-f64
    knife-edge (see module docstring). Evaluated entirely in f64 with
    the oracle's own grad/hess entering tree t."""
    grad, hess = grads_fn(oracle, t, binned, y, w)
    rows = _node_rows(arrs, t, nid, binned)

    F_a, S_a, D_a, L_a = arrs
    picks, infos = {}, []
    if not o["leaf"]:
        picks["oracle"] = (o["feature"], o["bin"], o["default_left"])
    if not bool(L_a[t, nid]):
        picks["ours"] = (int(F_a[t, nid]), int(S_a[t, nid]),
                         bool(D_a[t, nid]))
    stats = {}
    for name, (f, b, dl) in picks.items():
        g, mh = _split_stats(rows, f, b, dl, binned, grad, hess)
        stats[name] = (g, mh)
        infos.append(f"{name}: f{f} b{b} dl={dl} gain={g:.6f} minh={mh:.6f}")
    if len(stats) == 2:  # both split, differently
        (g1, m1), (g2, m2) = stats["oracle"], stats["ours"]
        ok = (abs(g1 - g2) <= 1e-3 * max(1.0, abs(g1))
              or abs(m1 - mcw) <= 1e-3 or abs(m2 - mcw) <= 1e-3)
    else:  # leaf-vs-split flip: the split side must be boundary-marginal
        g1, m1 = next(iter(stats.values()))
        ok = abs(m1 - mcw) <= 1e-3 or abs(g1 - MSG) <= 1e-3
    return ok, "; ".join(infos)


def _logloss(margin, y, w):
    p = 1 / (1 + np.exp(-margin))
    eps = 1e-12
    return float(np.average(-(y * np.log(p + eps)
                              + (1 - y) * np.log(1 - p + eps)), weights=w))


@pytest.mark.filterwarnings("ignore::RuntimeWarning")
@settings(max_examples=25, deadline=None, derandomize=True, database=None)
@given(dataset())
def test_fuzz_matches_numpy_oracle(data):
    from tests.oracles.gbdt_oracle import OracleGBDT

    X, y, w, kinds, weight_kind = data

    model = train_gbdt(X, y, PARAMS, sample_weight=w)
    ours = np.asarray(predict_margin(model, X, n_trees=ROUNDS))
    assert np.isfinite(ours).all(), (kinds, weight_kind)

    # mirror train_gbdt's internal wiring: weight-aware quantile sketch
    # on the BASE weights (scale_pos_weight never enters binning)
    spec = fit_bins(X, BINS, sample_weight=w)
    binned = np.asarray(apply_bins(spec, X))
    oracle = OracleGBDT(n_rounds=ROUNDS, max_depth=DEPTH, learning_rate=LR,
                        reg_alpha=ALPHA, reg_lambda=LAM,
                        min_child_weight=MCW, n_bins=BINS)
    y64, w64 = y.astype(np.float64), w.astype(np.float64)
    oracle.fit(binned, y64, w64)
    want = oracle.predict_margin(binned)

    if np.allclose(ours, want, rtol=2e-3, atol=2e-3):
        return

    div = _first_divergence(model, oracle, binned)
    assert div is not None, (
        f"margins differ with identical forests (leaf-value bug?) "
        f"kinds={kinds} weights={weight_kind}")
    t, nid, o, arrs = div
    ok, info = _is_knife_edge(t, nid, o, arrs, binned, y64, w64, oracle)
    assert ok, (f"non-knife-edge divergence at tree {t} node {nid}: {info} "
                f"kinds={kinds} weights={weight_kind}")

    d_loss = _logloss(ours, y64, w64) - _logloss(want, y64, w64)
    assert d_loss <= 0.02, (
        f"knife-edge divergence but loss degraded by {d_loss:.4f} "
        f"kinds={kinds} weights={weight_kind}")


REG_MCW = 1.7  # non-integer: unit-weight hessian sums (= row counts for
# reg:squarederror) can never sit ON the boundary, cutting the legitimate
# knife-edge rate; boundary hits under continuous weights remain handled.
REG_PARAMS = GBDTParams(n_rounds=ROUNDS, max_depth=DEPTH, learning_rate=LR,
                        subsample=1.0, colsample_bytree=1.0,
                        min_child_weight=REG_MCW, reg_alpha=ALPHA,
                        reg_lambda=LAM, n_bins=BINS, base_score=0.5,
                        eval_metric="rmse")


def _wmse(margin, y, w):
    return float(np.average((margin - y) ** 2, weights=w))


@pytest.mark.filterwarnings("ignore::RuntimeWarning")
@settings(max_examples=25, deadline=None, derandomize=True, database=None)
@given(dataset(), st.floats(0.0, 0.3))
def test_fuzz_regression_matches_numpy_oracle(data, eps):
    """reg:squarederror (the soft-label trainers' objective, reference
    train_v102_label_smoothing.py:113-137) on adversarial data with
    smoothed continuous targets."""
    from mallorn_tpu.trees import objectives
    from tests.oracles.gbdt_oracle import OracleRegressionGBDT

    X, y, w, kinds, weight_kind = data
    y_soft = (y * (1 - eps) + 0.5 * eps).astype(np.float32)

    model = train_gbdt(X, y_soft, REG_PARAMS, sample_weight=w,
                       scale_pos_weight=1.0,
                       objective=objectives.squarederror)
    ours = np.asarray(predict_margin(model, X, n_trees=ROUNDS))
    assert np.isfinite(ours).all(), (kinds, weight_kind)

    spec = fit_bins(X, BINS, sample_weight=w)
    binned = np.asarray(apply_bins(spec, X))
    oracle = OracleRegressionGBDT(base_score=0.5, n_rounds=ROUNDS,
                                  max_depth=DEPTH, learning_rate=LR,
                                  reg_alpha=ALPHA, reg_lambda=LAM,
                                  min_child_weight=REG_MCW, n_bins=BINS)
    y64, w64 = y_soft.astype(np.float64), w.astype(np.float64)
    oracle.fit(binned, y64, w64)
    want = oracle.predict_margin(binned)

    if np.allclose(ours, want, rtol=2e-3, atol=2e-3):
        return

    div = _first_divergence(model, oracle, binned)
    assert div is not None, (
        f"margins differ with identical forests (leaf-value bug?) "
        f"kinds={kinds} weights={weight_kind}")
    t, nid, o, arrs = div
    ok, info = _is_knife_edge(t, nid, o, arrs, binned, y64, w64, oracle,
                              mcw=REG_MCW, grads_fn=_grads_regression)
    assert ok, (f"non-knife-edge divergence at tree {t} node {nid}: {info} "
                f"kinds={kinds} weights={weight_kind}")

    d = _wmse(ours, y64, w64) - _wmse(want, y64, w64)
    assert d <= 0.01, (f"knife-edge divergence but wMSE degraded by {d:.5f} "
                       f"kinds={kinds} weights={weight_kind}")


# ----------------------------- multiclass (v62 path)

K_CLASS = 4
MC_PARAMS = GBDTParams(n_rounds=6, max_depth=DEPTH, learning_rate=LR,
                       subsample=1.0, colsample_bytree=1.0,
                       min_child_weight=REG_MCW, reg_alpha=ALPHA,
                       reg_lambda=LAM, n_bins=BINS, num_class=K_CLASS)


@st.composite
def mc_dataset(draw):
    X, y, w, kinds, weight_kind = draw(dataset())
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    y_mc = rng.integers(0, K_CLASS, size=len(y)).astype(np.float32)
    live = np.flatnonzero(w > 0)
    for k in range(K_CLASS):  # every class present among live rows
        y_mc[live[2 * k:2 * k + 2]] = k
    return X, y_mc, w, kinds, weight_kind


def _first_divergence_mc(model, oracle, binned):
    F_a = np.asarray(model.forest.feature)      # [R, K, nodes]
    S_a = np.asarray(model.forest.split_bin)
    D_a = np.asarray(model.forest.default_left)
    L_a = np.asarray(model.forest.is_leaf)
    for t, round_trees in enumerate(oracle.trees):
        for k, tree in enumerate(round_trees):
            for nid in range(2 ** DEPTH - 1):
                o = tree.get(nid)
                if o is None:
                    continue
                ours_leaf = bool(L_a[t, k, nid])
                same = (o["leaf"] == ours_leaf and (o["leaf"] or (
                    o["feature"] == F_a[t, k, nid]
                    and o["bin"] == S_a[t, k, nid]
                    and o["default_left"] == bool(D_a[t, k, nid]))))
                if not same:
                    arrs = (F_a[:, k], S_a[:, k], D_a[:, k], L_a[:, k])
                    return t, k, nid, o, arrs
    return None


def _grads_mc(oracle, t, k, binned, y, w):
    n, K = len(y), oracle.n_class
    margin = np.zeros((n, K))
    for tt in range(t):
        for kk, tree in enumerate(oracle.trees[tt]):
            margin[:, kk] += oracle._predict_tree(tree, binned)
    z = margin - margin.max(axis=1, keepdims=True)
    prob = np.exp(z)
    prob /= prob.sum(axis=1, keepdims=True)
    yk = np.eye(K)[np.asarray(y, int)]
    grad = w * (prob[:, k] - yk[:, k])
    hess = w * np.maximum(2.0 * prob[:, k] * (1 - prob[:, k]), 1e-16)
    return grad, hess


def _mlogloss(margin, y, w):
    z = margin - margin.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    rows = p[np.arange(len(y)), np.asarray(y, int)]
    return float(np.average(-np.log(rows + 1e-12), weights=w))


@pytest.mark.filterwarnings("ignore::RuntimeWarning")
@settings(max_examples=20, deadline=None, derandomize=True, database=None)
@given(mc_dataset())
def test_fuzz_multiclass_matches_numpy_oracle(data):
    """multi:softprob (reference v62 semantics,
    scripts/train_v62_multiclass_ensemble.py:176-177) on adversarial
    data: K trees per round on softmax grad/hess."""
    from tests.oracles.gbdt_oracle import OracleMulticlassGBDT

    X, y, w, kinds, weight_kind = data

    model = train_gbdt(X, y, MC_PARAMS, sample_weight=w,
                       scale_pos_weight=1.0)
    ours = np.asarray(predict_margin(model, X,
                                     n_trees=MC_PARAMS.n_rounds))
    assert np.isfinite(ours).all(), (kinds, weight_kind)

    spec = fit_bins(X, BINS, sample_weight=w)
    binned = np.asarray(apply_bins(spec, X))
    oracle = OracleMulticlassGBDT(n_class=K_CLASS,
                                  n_rounds=MC_PARAMS.n_rounds,
                                  max_depth=DEPTH, learning_rate=LR,
                                  reg_alpha=ALPHA, reg_lambda=LAM,
                                  min_child_weight=REG_MCW, n_bins=BINS)
    y64, w64 = y.astype(np.float64), w.astype(np.float64)
    oracle.fit(binned, y64, w64)
    want = oracle.predict_margin(binned)

    if np.allclose(ours, want, rtol=2e-3, atol=2e-3):
        return

    div = _first_divergence_mc(model, oracle, binned)
    assert div is not None, (
        f"margins differ with identical forests (leaf-value bug?) "
        f"kinds={kinds} weights={weight_kind}")
    t, k, nid, o, arrs = div
    grads_fn = lambda orc, tt, b, yy, ww: _grads_mc(orc, tt, k, b, yy, ww)
    ok, info = _is_knife_edge(t, nid, o, arrs, binned, y64, w64, oracle,
                              mcw=REG_MCW, grads_fn=grads_fn)
    assert ok, (f"non-knife-edge divergence at round {t} class {k} node "
                f"{nid}: {info} kinds={kinds} weights={weight_kind}")

    d = _mlogloss(ours, y64, w64) - _mlogloss(want, y64, w64)
    assert d <= 0.02, (f"knife-edge divergence but mlogloss degraded by "
                       f"{d:.4f} kinds={kinds} weights={weight_kind}")


# ----------------------------- distributed trainer (VERDICT r4 weak #5)


def _model_divergence(single, sharded):
    """First structural mismatch between two depthwise GBDTModels, in
    (tree, heap-node) order — the same walk _first_divergence does
    against the oracle."""
    F1, F2 = (np.asarray(single.forest.feature),
              np.asarray(sharded.forest.feature))
    S1, S2 = (np.asarray(single.forest.split_bin),
              np.asarray(sharded.forest.split_bin))
    D1, D2 = (np.asarray(single.forest.default_left),
              np.asarray(sharded.forest.default_left))
    L1, L2 = (np.asarray(single.forest.is_leaf),
              np.asarray(sharded.forest.is_leaf))
    for t in range(F1.shape[0]):
        for nid in range(F1.shape[1]):
            leaf1, leaf2 = bool(L1[t, nid]), bool(L2[t, nid])
            same = (leaf1 == leaf2 and (leaf1 or (
                F1[t, nid] == F2[t, nid] and S1[t, nid] == S2[t, nid]
                and bool(D1[t, nid]) == bool(D2[t, nid]))))
            if not same:
                return t, nid
    return None


@pytest.mark.filterwarnings("ignore::RuntimeWarning")
@settings(max_examples=15, deadline=None, derandomize=True, database=None)
@given(dataset())
def test_fuzz_sharded_matches_single_device(data):
    """The distributed trainer's identical-forest contract under
    adversarial structure (VERDICT r4 weak #5): every hypothesis draw
    also trains row-sharded on the 8-virtual-device CPU mesh
    (histograms psum'd over the mesh axis — parallel/sharded_train.py)
    and must reproduce the single-device forest EXACTLY. The only
    tolerated exception mirrors the oracle fuzz: a first divergence
    that is a provable knife-edge — psum'd f32 histograms may sum in a
    different order than the single-device segment sum, so two
    candidates whose f64 gains agree within 1e-3 (or a min-child-weight
    boundary hit) may legitimately resolve differently — and then the
    train logloss must still match within 0.02. A real sharding defect
    (wrong psum payload, row leakage across shards, padded-row
    contamination) produces a non-knife-edge divergence and fails."""
    import jax

    from mallorn_tpu.parallel.mesh import make_mesh
    from mallorn_tpu.parallel.sharded_train import train_gbdt_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh (conftest)")

    X, y, w, kinds, weight_kind = data
    single = train_gbdt(X, y, PARAMS, sample_weight=w)
    sharded = train_gbdt_sharded(make_mesh(8), X, y, PARAMS,
                                 sample_weight=w)

    m1 = np.asarray(predict_margin(single, X, n_trees=ROUNDS))
    m2 = np.asarray(predict_margin(sharded, X, n_trees=ROUNDS))
    assert np.isfinite(m2).all(), (kinds, weight_kind)

    div = _model_divergence(single, sharded)
    if div is None:
        np.testing.assert_allclose(
            np.asarray(single.forest.leaf_value),
            np.asarray(sharded.forest.leaf_value), rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(m1, m2, rtol=5e-3, atol=5e-3)
        return

    t, nid = div
    spec = fit_bins(X, BINS, sample_weight=w)
    binned = np.asarray(apply_bins(spec, X))
    y64, w64 = y.astype(np.float64), w.astype(np.float64)
    margin_t = (np.asarray(predict_margin(single, X,
                                          n_trees=t)).astype(np.float64)
                if t > 0 else np.zeros(len(y), np.float64))
    prob = 1.0 / (1.0 + np.exp(-margin_t))
    grad, hess = w64 * (prob - y64), w64 * prob * (1 - prob)

    arrs1 = tuple(np.asarray(a) for a in (
        single.forest.feature, single.forest.split_bin,
        single.forest.default_left, single.forest.is_leaf))
    rows = _node_rows(arrs1, t, nid, binned)

    picks = {}
    for name, mdl in (("single", single), ("sharded", sharded)):
        Lm = np.asarray(mdl.forest.is_leaf)
        if not bool(Lm[t, nid]):
            picks[name] = (int(np.asarray(mdl.forest.feature)[t, nid]),
                           int(np.asarray(mdl.forest.split_bin)[t, nid]),
                           bool(np.asarray(mdl.forest.default_left)[t, nid]))
    stats = {name: _split_stats(rows, f, b, dl, binned, grad, hess)
             for name, (f, b, dl) in picks.items()}
    if len(stats) == 2:
        (g1, mh1), (g2, mh2) = stats.values()
        ok = (abs(g1 - g2) <= 1e-3 * max(1.0, abs(g1))
              or abs(mh1 - MCW) <= 1e-3 or abs(mh2 - MCW) <= 1e-3)
    else:  # leaf-vs-split flip
        g1, mh1 = next(iter(stats.values()))
        ok = abs(mh1 - MCW) <= 1e-3 or abs(g1 - MSG) <= 1e-3
    assert ok, (f"non-knife-edge sharded divergence at tree {t} node {nid}: "
                f"{stats} kinds={kinds} weights={weight_kind}")

    d_loss = _logloss(m2, y64, w64) - _logloss(m1, y64, w64)
    assert d_loss <= 0.02, (
        f"sharded knife-edge divergence but loss degraded by {d_loss:.4f} "
        f"kinds={kinds} weights={weight_kind}")
