"""Plain-NumPy histogram GBDT oracle (loop-based, independent of the JAX
implementation) used to validate split search, NaN routing, regularization
and leaf values exactly. No subsampling."""

import numpy as np


def shrink(g, alpha):
    return np.sign(g) * np.maximum(np.abs(g) - alpha, 0.0)


def score(g, h, alpha, lam):
    s = shrink(g, alpha)
    return s * s / (h + lam)


class OracleGBDT:
    def __init__(self, n_rounds=20, max_depth=3, learning_rate=0.1,
                 reg_alpha=0.2, reg_lambda=1.5, min_child_weight=3.0,
                 n_bins=256, min_split_gain=1e-6):
        self.p = dict(n_rounds=n_rounds, max_depth=max_depth, lr=learning_rate,
                      alpha=reg_alpha, lam=reg_lambda, mcw=min_child_weight,
                      n_bins=n_bins, msg=min_split_gain)
        self.trees = []

    def fit(self, binned, y, w):
        p = self.p
        n = len(y)
        margin = np.zeros(n)
        for _ in range(p["n_rounds"]):
            prob = 1 / (1 + np.exp(-margin))
            grad = w * (prob - y)
            hess = w * prob * (1 - prob)
            tree = self._build_tree(binned, grad, hess)
            self.trees.append(tree)
            margin += self._predict_tree(tree, binned)
        return margin

    def _build_tree(self, binned, grad, hess):
        p = self.p
        depth = p["max_depth"]
        missing = p["n_bins"]
        nodes = {}  # heap id -> dict
        assign = np.zeros(len(grad), dtype=int)

        for d in range(depth):
            for local in range(2 ** d):
                nid = 2 ** d - 1 + local
                rows = np.where(assign == nid)[0]
                g_tot, h_tot = grad[rows].sum(), hess[rows].sum()
                best = (-np.inf, None, None, None)
                parent = score(g_tot, h_tot, p["alpha"], p["lam"])
                for f in range(binned.shape[1]):
                    b = binned[rows, f]
                    hg = np.bincount(b, weights=grad[rows], minlength=missing + 1)
                    hh = np.bincount(b, weights=hess[rows], minlength=missing + 1)
                    cg = np.cumsum(hg[:missing])
                    ch = np.cumsum(hh[:missing])
                    for dl, (gl0, hl0) in enumerate(
                            [(cg, ch), (cg + hg[missing], ch + hh[missing])]):
                        gr, hr = g_tot - gl0, h_tot - hl0
                        ok = (hl0 >= p["mcw"]) & (hr >= p["mcw"])
                        gain = 0.5 * (score(gl0, hl0, p["alpha"], p["lam"])
                                      + score(gr, hr, p["alpha"], p["lam"]) - parent)
                        gain = np.where(ok, gain, -np.inf)
                        bi = int(np.argmax(gain))
                        if gain[bi] > best[0]:
                            best = (gain[bi], f, bi, bool(dl))
                if best[0] <= p["msg"] or len(rows) == 0:
                    val = (-p["lr"] * shrink(g_tot, p["alpha"]) / (h_tot + p["lam"])
                           if h_tot > 0 else 0.0)
                    nodes[nid] = {"leaf": True, "value": val}
                else:
                    gain, f, b, dl = best
                    nodes[nid] = {"leaf": False, "feature": f, "bin": b,
                                  "default_left": dl, "gain": gain}
                    bvals = binned[rows, f]
                    go_left = np.where(bvals == missing, dl, bvals <= b)
                    assign[rows] = np.where(go_left, 2 * nid + 1, 2 * nid + 2)

        for local in range(2 ** depth):
            nid = 2 ** depth - 1 + local
            rows = np.where(assign == nid)[0]
            g_tot, h_tot = grad[rows].sum(), hess[rows].sum()
            val = (-p["lr"] * shrink(g_tot, p["alpha"]) / (h_tot + p["lam"])
                   if h_tot > 0 else 0.0)
            nodes[nid] = {"leaf": True, "value": val}
        return nodes

    def _predict_tree(self, tree, binned):
        p = self.p
        missing = p["n_bins"]
        out = np.zeros(binned.shape[0])
        for i in range(binned.shape[0]):
            nid = 0
            while not tree[nid]["leaf"]:
                nd = tree[nid]
                b = binned[i, nd["feature"]]
                go_left = nd["default_left"] if b == missing else b <= nd["bin"]
                nid = 2 * nid + (1 if go_left else 2)
            out[i] = tree[nid]["value"]
        return out

    def predict_margin(self, binned):
        return sum(self._predict_tree(t, binned) for t in self.trees)


class OracleMulticlassGBDT(OracleGBDT):
    """multi:softprob oracle: K trees per round on softmax grad/hess
    (grad = p_k - 1{y=k}, hess = max(2 p_k (1-p_k), 1e-16) — XGBoost's
    SoftmaxMultiClassObj; gpair computed once at round start)."""

    def __init__(self, n_class, **kw):
        super().__init__(**kw)
        self.n_class = n_class

    def fit(self, binned, y, w):
        p = self.p
        n, K = len(y), self.n_class
        margin = np.zeros((n, K))
        yk = np.eye(K)[np.asarray(y, int)]
        for _ in range(p["n_rounds"]):
            z = margin - margin.max(axis=1, keepdims=True)
            prob = np.exp(z)
            prob /= prob.sum(axis=1, keepdims=True)
            grads = w[:, None] * (prob - yk)
            hesss = w[:, None] * np.maximum(2.0 * prob * (1 - prob), 1e-16)
            round_trees = []
            for k in range(K):
                tree = self._build_tree(binned, grads[:, k], hesss[:, k])
                round_trees.append(tree)
                margin[:, k] += self._predict_tree(tree, binned)
            self.trees.append(round_trees)
        return margin

    def predict_margin(self, binned):
        out = np.zeros((binned.shape[0], self.n_class))
        for round_trees in self.trees:
            for k, t in enumerate(round_trees):
                out[:, k] += self._predict_tree(t, binned)
        return out


class OracleRegressionGBDT(OracleGBDT):
    """reg:squarederror oracle: grad = w*(pred - y), hess = w, prediction
    bias base_score (XGBoost regression default 0.5)."""

    def __init__(self, base_score=0.5, **kw):
        super().__init__(**kw)
        self.base_score = base_score

    def fit(self, binned, y, w):
        p = self.p
        margin = np.full(len(y), self.base_score)
        for _ in range(p["n_rounds"]):
            grad = w * (margin - y)
            hess = w.astype(np.float64).copy()
            tree = self._build_tree(binned, grad, hess)
            self.trees.append(tree)
            margin += self._predict_tree(tree, binned)
        return margin

    def predict_margin(self, binned):
        return self.base_score + sum(
            self._predict_tree(t, binned) for t in self.trees)
