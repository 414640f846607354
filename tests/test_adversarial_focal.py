"""Adversarial-validation semantics + focal objective numerical pinning."""

import numpy as np
import pytest

from mallorn_tpu.train.adversarial import adversarial_validation
from mallorn_tpu.trees import objectives
from mallorn_tpu.trees.gbdt import GBDTParams


def test_adversarial_detects_injected_shift():
    rng = np.random.default_rng(0)
    Xtr = rng.normal(size=(400, 10)).astype(np.float32)
    Xte = rng.normal(size=(400, 10)).astype(np.float32)
    Xte[:, 0] += 2.0  # strong covariate shift
    res = adversarial_validation(Xtr, Xte,
                                 params=GBDTParams(n_rounds=60, max_depth=3,
                                                   learning_rate=0.1))
    assert res.auc > 0.8
    assert res.distribution_shift
    # reference weight map: 0.5 + 1.5 * p(test-like) in [0.5, 2.0]
    np.testing.assert_allclose(res.sample_weights,
                               0.5 + 1.5 * res.train_adv_preds)
    assert res.sample_weights.min() >= 0.5 and res.sample_weights.max() <= 2.0
    # the shifted feature should carry most of the importance
    assert np.argmax(res.importance_gain) == 0


def test_adversarial_no_shift_uniform_weights():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(800, 8)).astype(np.float32)
    res = adversarial_validation(X[:400], X[400:],
                                 params=GBDTParams(n_rounds=40, max_depth=3))
    assert res.auc < 0.6
    if not res.distribution_shift:
        np.testing.assert_array_equal(res.sample_weights, np.ones(400))


def test_focal_grad_hess_matches_reference_algebra():
    """Pin our focal objective against an independent NumPy transcription
    of the reference's Adversarial_Focal_Loss math
    (train_v92_focal_adversarial.py:116-150)."""
    rng = np.random.default_rng(2)
    n = 200
    pred = rng.normal(size=n)
    label = rng.integers(0, 2, n).astype(np.float64)
    weights = rng.uniform(0.5, 2.0, n)
    gamma, alpha = 2.0, 0.85

    sig = 1.0 / (1.0 + np.exp(-pred))
    alpha_t = label * alpha + (1 - label) * (1 - alpha)

    def robust_pow(b, p):
        return np.sign(b) * np.abs(b) ** p

    g1 = sig * (1 - sig)
    g2 = label + ((-1.0) ** label) * sig
    g3 = sig + label - 1
    g4 = 1 - label - ((-1.0) ** label) * sig
    g5 = label + ((-1.0) ** label) * sig
    want_grad = weights * alpha_t * (
        gamma * g3 * robust_pow(g2, gamma) * np.log(g4 + 1e-9)
        + ((-1.0) ** label) * robust_pow(g5, gamma + 1))
    h1 = robust_pow(g2, gamma) + gamma * ((-1.0) ** label) * g3 * robust_pow(g2, gamma - 1)
    h2 = ((-1.0) ** label) * g3 * robust_pow(g2, gamma) / (g4 + 1e-9)
    want_hess = weights * alpha_t * (
        (h1 * np.log(g4 + 1e-9) - h2) * gamma
        + (gamma + 1) * robust_pow(g5, gamma)) * g1

    obj = objectives.make_focal(gamma=gamma, alpha=alpha)
    got_grad, got_hess = obj(pred.astype(np.float32), label.astype(np.float32),
                             weights.astype(np.float32))
    np.testing.assert_allclose(np.asarray(got_grad), want_grad, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_hess), want_hess, rtol=2e-4, atol=2e-5)
