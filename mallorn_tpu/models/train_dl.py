"""Training harness for the Flax baselines: focal / weighted-BCE losses,
optax Adam loop, F1 threshold sweep on validation (replacing the torch
loops in reference src/models/*.py + their FocalLoss heads)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mallorn_tpu.models.data import SequenceBatch


def focal_loss(logits, labels, gamma: float = 2.0, alpha: float = 0.85):
    """Binary focal loss (reference src/models/focal_loss.py capability)."""
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(labels > 0.5, p, 1.0 - p)
    alpha_t = jnp.where(labels > 0.5, alpha, 1.0 - alpha)
    ce = -jnp.log(jnp.clip(pt, 1e-7, 1.0))
    return jnp.mean(alpha_t * (1.0 - pt) ** gamma * ce)


def weighted_bce(logits, labels, pos_weight: float = 10.0):
    ce = optax.sigmoid_binary_cross_entropy(logits, labels)
    w = jnp.where(labels > 0.5, pos_weight, 1.0)
    return jnp.mean(w * ce)


def save_params(path, params) -> str:
    """Persist a Flax params pytree (orbax StandardCheckpointer)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path, like=None):
    """Restore a params pytree saved by save_params. ``like`` (an abstract
    or concrete pytree of the same structure) enables exact restoration."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(str(path)),
                             target=jax.tree.map(np.asarray, like))
    return ckptr.restore(os.path.abspath(str(path)))


@dataclasses.dataclass
class DLResult:
    params: dict
    val_probs: Optional[np.ndarray]
    val_f1: float
    threshold: float
    losses: np.ndarray


def train_model(model, batch: SequenceBatch, val_batch: Optional[SequenceBatch] = None,
                loss_fn: Callable = focal_loss, n_epochs: int = 100,
                lr: float = 1e-3, seed: int = 0, tabular=None,
                val_tabular=None) -> DLResult:
    """Full-batch Adam training (datasets are thousands of objects — one
    device batch)."""
    rng = jax.random.PRNGKey(seed)
    is_atat = tabular is not None

    def apply(params, b, tab, train, rng):
        kwargs = {"train": train}
        if train:
            kwargs["rngs"] = {"dropout": rng}
        if is_atat:
            return model.apply(params, b, tab, **kwargs)
        return model.apply(params, b, **kwargs)

    init_rng, rng = jax.random.split(rng)
    if is_atat:
        params = model.init({"params": init_rng}, batch, tabular, train=False)
    else:
        params = model.init({"params": init_rng}, batch, train=False)

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    y = batch.label.astype(jnp.float32)

    @jax.jit
    def step(params, opt_state, rng):
        rng, drng = jax.random.split(rng)

        def loss(p):
            logits = apply(p, batch, tabular, True, drng)
            return loss_fn(logits, y)

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state2, rng, l

    losses = []
    for _ in range(n_epochs):
        params, opt_state, rng, l = step(params, opt_state, rng)
        losses.append(float(l))

    val_probs, f1, thresh = None, float("nan"), 0.5
    if val_batch is not None and val_batch.label is not None:
        logits = apply(params, val_batch, val_tabular, False, rng)
        val_probs = np.asarray(jax.nn.sigmoid(logits))
        from mallorn_tpu.train.cv import threshold_sweep

        f1, thresh = threshold_sweep(np.asarray(val_batch.label), val_probs)

    return DLResult(params=params, val_probs=val_probs, val_f1=f1,
                    threshold=thresh, losses=np.asarray(losses))
