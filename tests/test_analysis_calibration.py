"""Real unit tests for train/calibration.py, train/analysis.py and
train/visualize.py (round-1 COVERAGE.md overclaimed 'inline smoke' —
VERDICT weak #7)."""

import numpy as np
import pytest

from mallorn_tpu.train import analysis, calibration


def _miscalibrated(n=4000, seed=0):
    """Overconfident predictor: true p drawn, reported p pushed to extremes."""
    rng = np.random.default_rng(seed)
    p_true = rng.uniform(0.02, 0.98, n)
    y = (rng.uniform(size=n) < p_true).astype(float)
    z = np.log(p_true / (1 - p_true))
    p_reported = 1 / (1 + np.exp(-2.5 * z))  # a=2.5 overconfidence
    return y, p_reported


def _logloss(y, p):
    p = np.clip(p, 1e-9, 1 - 1e-9)
    return -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()


def test_platt_recovers_overconfidence():
    y, p = _miscalibrated()
    cal, (a, b) = calibration.platt_scale(p, y, p, n_iter=2000, lr=0.5)
    assert _logloss(y, cal) < _logloss(y, p) - 0.01
    # the fitted slope must undo the 2.5x logit inflation
    assert 0.25 < a < 0.6, a


def test_isotonic_improves_and_is_monotone():
    y, p = _miscalibrated(seed=1)
    grid = np.linspace(0.01, 0.99, 101)
    cal_grid = calibration.isotonic_calibrate(p, y, grid)
    assert (np.diff(cal_grid) >= -1e-12).all()
    cal = calibration.isotonic_calibrate(p, y, p)
    assert _logloss(y, cal) < _logloss(y, p)


def test_threshold_variants():
    preds = np.array([0.1, 0.4, 0.6, 0.9])
    out = calibration.threshold_variants(preds, [0.3, 0.5, 0.8])
    assert out[0.3].sum() == 3 and out[0.5].sum() == 2 and out[0.8].sum() == 1


def test_importance_report_ranks():
    names = [f"f{i}" for i in range(6)]
    gains = np.array([1.0, 5.0, 0.0, 3.0, 0.5, 0.1])
    df = analysis.importance_report(names, gains, top_k=3)
    assert list(df["feature"]) == ["f1", "f3", "f0"]
    np.testing.assert_allclose(df["share"].iloc[0], 5.0 / gains.sum())


def test_distribution_drift_finds_shifted_feature():
    rng = np.random.default_rng(2)
    Xa = rng.normal(size=(500, 4))
    Xb = rng.normal(size=(500, 4))
    Xb[:, 2] += 3.0  # inject a 3-sigma mean shift
    df = analysis.distribution_drift(Xa, Xb, ["a", "b", "shifted", "d"])
    assert df.iloc[0]["feature"] == "shifted"
    assert df.iloc[0]["shift_sigma"] > 2.0


def test_compare_experiments_sorted():
    df = analysis.compare_experiments({
        "v1": {"oof_f1": 0.3, "threshold": 0.5},
        "v2": {"oof_f1": 0.7, "threshold": 0.4, "adv_auc": 0.7},
    })
    assert list(df["experiment"]) == ["v2", "v1"]


def test_prediction_agreement_matrix():
    preds = {"a": np.array([0.9, 0.1, 0.9]), "b": np.array([0.9, 0.9, 0.9])}
    df = analysis.prediction_agreement(preds)
    assert df.loc["a", "a"] == 1.0
    np.testing.assert_allclose(df.loc["a", "b"], 2 / 3)


def test_visualizations_write_pngs(tmp_path):
    pytest.importorskip("matplotlib")
    from mallorn_tpu.data.synthetic import generate_dataset
    from mallorn_tpu.train import visualize

    rng = np.random.default_rng(3)
    y = rng.integers(0, 2, 200)
    preds = np.clip(y * 0.6 + rng.uniform(0, 0.4, 200), 0, 1)
    packed, meta, _ = generate_dataset(4, seed=5)

    paths = [
        visualize.plot_confusion(y, preds, 0.4, tmp_path / "cm.png"),
        visualize.plot_importance([f"f{i}" for i in range(30)],
                                  rng.exponential(1, 30), tmp_path / "imp.png"),
        visualize.plot_prediction_distribution(preds, y, 0.4,
                                               tmp_path / "dist.png"),
        visualize.plot_adversarial_weights(0.5 + 1.5 * preds,
                                           tmp_path / "w.png"),
        visualize.plot_lightcurve(packed, 0, tmp_path / "lc.png",
                                  meta.object_ids[0]),
    ]
    for p in paths:
        assert p.exists() and p.stat().st_size > 2000, p


def test_error_analysis_v121():
    """v121 capability: per-object FN/FP report, hard-TDE count, group
    feature stats, FN recovery by other models
    (reference: scripts/train_v121_error_analysis.py)."""
    rng = np.random.default_rng(11)
    n = 400
    y = (rng.uniform(size=n) < 0.1).astype(int)
    # preds: mostly separable, with a few engineered errors
    p = np.where(y == 1, 0.8, 0.1) + rng.normal(0, 0.03, n)
    fn_rows = np.where(y == 1)[0][:3]
    p[fn_rows] = [0.05, 0.2, 0.45]       # hard (<0.1), soft, borderline
    fp_rows = np.where(y == 0)[0][:2]
    p[fp_rows] = 0.9
    X = rng.normal(size=(n, 5))
    X[:, 2] += 3.0 * y                    # informative feature
    X[fn_rows, 2] = 0.0                   # FNs look like background on it
    other = {"alt": np.where(y == 1, 0.9, 0.1)}  # recovers every FN

    rep = analysis.error_analysis(
        y, p, threshold=0.5, X=X,
        feature_names=[f"f{i}" for i in range(5)],
        importance_gain=np.array([0.1, 0.2, 5.0, 0.3, 0.1]),
        object_ids=np.arange(1000, 1000 + n),
        z=np.linspace(0, 1, n),
        spec_type=np.array(["TDE" if t else "SN" for t in y]),
        other_models=other)

    c = rep["confusion"]
    assert c["fn"] >= 3 and c["fp"] >= 2
    assert rep["hard_tde_count"] >= 1
    errors = rep["errors"]
    assert set(errors["group"]) == {"FN", "FP"}
    assert (errors["object_id"] >= 1000).all()
    assert 1000 + fn_rows[0] in set(errors["object_id"])
    # the informative feature should top the FN-vs-TP gap ranking
    assert rep["group_stats"].iloc[0]["feature"] == "f2"
    assert rep["fn_recovery"]["alt"] == c["fn"]
    assert rep["fn_recovery"]["missed_by_all"] == 0
    assert rep["confidence"]["borderline"]["n"] >= 1
    analysis.print_error_analysis(rep)  # smoke: renders without error
