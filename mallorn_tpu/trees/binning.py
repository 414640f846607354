"""Quantile binning for the histogram GBDT.

The TPU analog of XGBoost's quantile sketch (``tree_method='hist'``,
max_bin=256 — the configuration every reference training script uses,
e.g. reference: scripts/train_v34a_bazin.py:146). Bin edges come from
feature quantiles over the training matrix; NaN maps to a reserved
missing bin whose routing direction is learned per split.

Edges are computed once on host (N*F is small: 10k x 222); the per-row
bin assignment is a vectorized device op (searchsorted along bins), run
wherever the matrix lives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BinSpec(NamedTuple):
    edges: jnp.ndarray  # [F, n_bins-1] ascending split points
    n_bins: int  # number of value bins; bin id n_bins is "missing"

    @property
    def missing_bin(self) -> int:
        return self.n_bins


def fit_bins(X: np.ndarray, n_bins: int = 256) -> BinSpec:
    """Per-feature quantile edges from finite values.

    ±inf is clamped to ±1e10 first, mirroring the reference's
    ``np.nan_to_num(posinf=1e10, neginf=-1e10)`` preprocessing
    (reference: non_successful_tests/scripts/train_v92_focal_adversarial.py:102).
    """
    X = np.asarray(X, dtype=np.float64)
    X = np.clip(X, -1e10, 1e10)
    n, f = X.shape
    qs = np.linspace(0, 1, n_bins + 1)[1:-1]

    # one vectorized NaN-aware quantile call for every feature at once
    with np.errstate(all="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            q = np.nanquantile(X, qs, axis=0).T  # [F, n_bins-1]

    edges = np.full((f, n_bins - 1), np.inf, dtype=np.float32)
    all_nan = np.isnan(q).all(axis=1)
    for j in np.nonzero(~all_nan)[0]:
        e = np.unique(q[j][np.isfinite(q[j])])
        edges[j, : len(e)] = e
    # features with no finite values: all rows route to the missing bin
    edges[all_nan] = np.arange(n_bins - 1, dtype=np.float32)
    return BinSpec(edges=jnp.asarray(edges), n_bins=n_bins)


@jax.jit
def apply_bins(spec: BinSpec, X: jnp.ndarray) -> jnp.ndarray:
    """Assign bin ids: [N, F] float -> [N, F] int32 in [0, n_bins].

    bin = #edges strictly below x; NaN -> missing bin (== n_bins).
    """
    Xc = jnp.clip(X, -1e10, 1e10)
    # per-feature binary search: vmap over features of searchsorted
    b = jax.vmap(
        lambda e, col: jnp.searchsorted(e, col, side="right"),
        in_axes=(0, 1), out_axes=1,
    )(spec.edges, Xc).astype(jnp.int32)
    return jnp.where(jnp.isnan(X), spec.n_bins, b)
