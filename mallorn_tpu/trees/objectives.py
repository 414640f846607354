"""Gradient/hessian objectives for the GBDT.

An objective is ``fn(margin, label, weight) -> (grad, hess)`` evaluated on
raw margins (pre-sigmoid). ``weight`` already folds in per-sample weights
(adversarial-validation weights in the winning pipeline) and
``scale_pos_weight``.

The focal loss matches the reference's custom XGBoost objective
(reference: non_successful_tests/scripts/train_v92_focal_adversarial.py:108-150),
including its exact grad/hess algebra so the trained trees agree.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def logistic(margin, label, weight):
    """binary:logistic — grad = w*(p - y), hess = w*p*(1-p)."""
    p = 1.0 / (1.0 + jnp.exp(-margin))
    grad = weight * (p - label)
    hess = weight * p * (1.0 - p)
    return grad, hess


@functools.lru_cache(maxsize=None)
def make_focal(gamma: float, alpha: float):
    """Focal-loss objective (reference v92 Adversarial_Focal_Loss).

    The sample weights (adversarial) arrive via ``weight``; alpha-balancing
    is applied per label as in the reference (:122). Cached so identical
    (gamma, alpha) configs share one closure — the objective is a static
    jit argument and a fresh closure would force a recompile.
    """

    def focal(margin, label, weight):
        p = 1.0 / (1.0 + jnp.exp(-margin))
        alpha_t = label * alpha + (1.0 - label) * (1.0 - alpha)

        def robust_pow(base, power):
            return jnp.sign(base) * jnp.abs(base) ** power

        sign = (-1.0) ** label  # +1 for label 0, -1 for label 1
        g1 = p * (1.0 - p)
        g2 = label + sign * p
        g3 = p + label - 1.0
        g4 = 1.0 - label - sign * p
        g5 = label + sign * p

        grad = weight * alpha_t * (
            gamma * g3 * robust_pow(g2, gamma) * jnp.log(g4 + 1e-9)
            + sign * robust_pow(g5, gamma + 1.0)
        )
        hess_1 = robust_pow(g2, gamma) + gamma * sign * g3 * robust_pow(g2, gamma - 1.0)
        hess_2 = sign * g3 * robust_pow(g2, gamma) / (g4 + 1e-9)
        hess = weight * alpha_t * (
            (hess_1 * jnp.log(g4 + 1e-9) - hess_2) * gamma
            + (gamma + 1.0) * robust_pow(g5, gamma)
        ) * g1
        return grad, hess

    # distinct cache identity per (gamma, alpha): the closure's qualname is
    # shared by every focal variant, and the AOT executable cache keys
    # static callables by it (utils.aot_cache._leaf_sig / config_digest)
    focal.__qualname__ = f"focal_g{gamma}_a{alpha}"
    focal._cache_key = focal.__qualname__
    return focal


def squarederror(margin, label, weight):
    """reg:squarederror — grad = w*(pred - y), hess = w.

    The soft-label trainers (label smoothing v102, soft pseudo-labels v97,
    knowledge distillation v108) all train XGBoost REGRESSION on blended
    float targets (reference:
    non_successful_tests/scripts/train_v102_label_smoothing.py:113-137,
    train_v97_soft_pseudo.py:122, train_v108_knowledge_distillation.py:213);
    predictions are the raw margins (no sigmoid). Pair with
    ``GBDTParams(base_score=0.5, eval_metric='rmse')`` for XGBoost's
    regression defaults."""
    grad = weight * (margin - label)
    hess = weight * jnp.ones_like(margin)
    return grad, hess


def logloss_metric(margin, label):
    """Unweighted binary logloss (XGBoost eval_metric='logloss')."""
    p = 1.0 / (1.0 + jnp.exp(-margin))
    eps = 1e-16
    p = jnp.clip(p, eps, 1.0 - eps)
    return -jnp.mean(label * jnp.log(p) + (1.0 - label) * jnp.log(1.0 - p))
