"""The final-deliverable ensemble (notebooks/kaggle_multiseed_ensemble.py).

test_cli.py drives `--config kaggle` end-to-end; here the pipeline
function's CONTRACT is pinned at unit scale: fixed CV folds shared by
every model/seed, per-model seed averaging, the LB weight table applied
to the blend, the notebook's NaN policy, and the per-model feature sets
(v92d/v34a on the full 224 names, v114d on base-222 + minimal research).
"""

import numpy as np
import pytest

from mallorn_tpu.train import pipelines

pytestmark = pytest.mark.slow

N, NTE, F = 160, 80, 12


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    names = [f"f{i}" for i in range(F - 2)] + list(pipelines.SHIFT_FEATURES)
    X = rng.normal(size=(N, F)).astype(np.float32)
    y = (0.9 * X[:, 0] - 0.5 * X[:, 3] + 0.5 * rng.normal(size=N) > 0.6)
    Xte = rng.normal(size=(NTE, F)).astype(np.float32)
    research = {n: rng.normal(size=N).astype(np.float32)
                for n in pipelines.V115_MINIMAL_RESEARCH}
    research_te = {n: rng.normal(size=NTE).astype(np.float32)
                   for n in pipelines.V115_MINIMAL_RESEARCH}
    return X, y.astype(np.float32), Xte, names, research, research_te


def _run(data, **kw):
    X, y, Xte, names, research, research_te = data
    small = pipelines.V34A_PARAMS._replace(n_rounds=8, max_depth=3)
    small_lgbm = pipelines.V114D_PARAMS._replace(n_rounds=8)
    return pipelines.run_kaggle_ensemble(
        X, y, names, research, Xte, research_te,
        xgb_params=small, lgbm_params=small_lgbm,
        seeds=(42, 123), n_folds=3, **kw)


def test_contract(data):
    X, y, Xte, names, research, research_te = data
    out = _run(data)

    # three models, notebook names
    assert set(out.per_model) == {"v92d", "v34a", "v114d"}
    for m in out.per_model.values():
        assert m["oof"].shape == (N,) and m["test"].shape == (NTE,)
        assert np.isfinite(m["oof"]).all() and np.isfinite(m["test"]).all()
        assert set(m["seed_f1s"]) == {42, 123}

    # the blend is EXACTLY the weighted sum of the per-model averages
    # (weights 0.45/0.30/0.25 — package_features_for_kaggle.py:183-188)
    want = sum(pipelines.KAGGLE_ENSEMBLE_WEIGHTS[k] * out.per_model[k]["oof"]
               for k in out.per_model)
    np.testing.assert_allclose(out.ensemble_oof, want, rtol=1e-6)
    want_te = sum(pipelines.KAGGLE_ENSEMBLE_WEIGHTS[k] * out.per_model[k]["test"]
                  for k in out.per_model)
    np.testing.assert_allclose(out.ensemble_test, want_te, rtol=1e-6)
    assert 0.03 <= out.threshold <= 0.5  # notebook grid :212
    assert np.isfinite(out.oof_f1)

    # adversarial weights live in the notebook's range
    w = out.adversarial.sample_weights
    assert w.min() >= 0.5 - 1e-6 and w.max() <= 2.0 + 1e-6


def test_v92d_and_v34a_differ_only_by_weights(data):
    """v92d and v34a share trees/features; with a FLAT adversarial weight
    vector (no shift detected) their seed-averaged predictions must be
    IDENTICAL — the only difference the notebook encodes is the
    use_adv_weights flag."""
    from mallorn_tpu.train.adversarial import AdversarialResult

    X, y, Xte, names, research, research_te = data
    flat = AdversarialResult(
        auc=0.5, distribution_shift=False,
        sample_weights=np.ones(N), train_adv_preds=np.zeros(N),
        importance_gain=np.zeros(F - 2))
    out = _run(data, adv=flat)
    np.testing.assert_allclose(out.per_model["v92d"]["oof"],
                               out.per_model["v34a"]["oof"],
                               rtol=1e-5, atol=1e-6)


def test_kaggle_nan_policy():
    """NaN -> 0, +/-inf -> +/-1e10 (kaggle_multiseed_ensemble.py:237)."""
    X = np.array([[np.nan, np.inf, -np.inf, 1.5]], np.float32)
    got = pipelines._kaggle_nan(X)
    np.testing.assert_array_equal(got, [[0.0, 1e10, -1e10, 1.5]])
