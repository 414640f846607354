"""The train/test-shift contract: adversarial validation must DETECT the
shifted synthetic test split and produce non-uniform weights that are
actually applied by the v92 training path.

This pins the mechanism that made the reference win — reweighting by
0.5 + 1.5 * p(test-like) under real distribution shift
(reference: non_successful_tests/scripts/adversarial_validation.py:246-264,
SOLUTION.md:23-37) — on data where the mechanism matters.
"""

import numpy as np
import pytest

from mallorn_tpu.data.packing import unify_time_padding
from mallorn_tpu.data.synthetic import generate_competition_splits
from mallorn_tpu.features import statistical
from mallorn_tpu.features.base import feature_matrix
from mallorn_tpu.train.adversarial import ADV_PARAMS, adversarial_validation
from mallorn_tpu.train.cv import train_cv
from mallorn_tpu.train.pipelines import V34A_PARAMS, _finite_or_nan


@pytest.fixture(scope="module")
def shifted_features():
    (tr_p, tr_m, _), (te_p, te_m, _) = generate_competition_splits(
        420, 420, seed=77, tde_frac=0.12)
    tr_p, te_p = unify_time_padding(tr_p, te_p)
    Xtr, names = feature_matrix(statistical.extract(tr_p, tr_m))
    Xte, _ = feature_matrix(statistical.extract(te_p, te_m), names)
    return (_finite_or_nan(Xtr), tr_m, _finite_or_nan(Xte), te_m)


def test_shift_detected_and_weights_nonuniform(shifted_features):
    Xtr, tr_m, Xte, te_m = shifted_features
    adv = adversarial_validation(Xtr, Xte,
                                 params=ADV_PARAMS._replace(n_rounds=60))
    assert adv.auc >= 0.55, adv.auc  # the shift must be detectable
    assert adv.distribution_shift
    w = adv.sample_weights
    assert w.min() >= 0.5 and w.max() <= 2.0
    assert w.std() > 0.05, w.std()  # genuinely non-uniform
    # test-like train objects get upweighted: weights = 0.5 + 1.5 p
    np.testing.assert_allclose(w, 0.5 + 1.5 * adv.train_adv_preds)


@pytest.mark.slow
def test_weights_change_the_trained_model(shifted_features):
    """The adversarial weights must actually flow into training: weighted
    CV produces different OOF predictions than unweighted CV."""
    Xtr, tr_m, Xte, te_m = shifted_features
    adv = adversarial_validation(Xtr, Xte,
                                 params=ADV_PARAMS._replace(n_rounds=60))
    params = V34A_PARAMS._replace(n_rounds=80, learning_rate=0.1)
    cv_u = train_cv(Xtr, tr_m.target, None, params)
    cv_w = train_cv(Xtr, tr_m.target, None, params,
                    sample_weight=adv.sample_weights)
    assert not np.allclose(cv_u.oof_preds, cv_w.oof_preds)
    # the task is hard but learnable: F1 interior of the realistic band,
    # threshold interior of the sweep grid (the reference's was 0.414)
    for cv in (cv_u, cv_w):
        assert 0.25 < cv.best_f1 < 0.98, cv.best_f1
        assert 0.05 < cv.best_threshold < 0.5, cv.best_threshold
