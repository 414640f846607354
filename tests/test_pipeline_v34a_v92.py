"""Integration: v34a backbone + v92 winning pipeline on synthetic data.

Slow (full extraction + 3 CV passes); the fast shifted-pipeline contract
lives in test_shifted_pipeline.py.
"""

import numpy as np
import pytest

from mallorn_tpu.data.synthetic import generate_dataset
from mallorn_tpu.train import pipelines
from mallorn_tpu.trees.gbdt import GBDTParams

pytestmark = pytest.mark.slow

FAST = GBDTParams(n_rounds=100, max_depth=5, learning_rate=0.1,
                  subsample=0.8, colsample_bytree=0.8,
                  min_child_weight=3.0, reg_alpha=0.2, reg_lambda=1.5)


@pytest.fixture(scope="module")
def v34a_run():
    tr_packed, tr_meta, _ = generate_dataset(260, seed=11, tde_frac=0.12)
    te_packed, te_meta, _ = generate_dataset(140, seed=12, tde_frac=0.12)
    res = pipelines.run_v34a(tr_packed, tr_meta, te_packed, te_meta,
                             params=FAST, gp_steps=60,
                             selection_params=FAST._replace(n_rounds=60),
                             top_k=120)
    return res, tr_meta, te_meta


def test_v34a_feature_contract(v34a_run):
    res, *_ = v34a_run
    # 120 selected + 25 tde + 27 gp2d + 52 bazin = 224 (SURVEY.md §2.6)
    assert len(res.feature_names) == 224, len(res.feature_names)
    assert len(res.selection.selected) == 120
    assert any("bazin" in n for n in res.feature_names)
    assert any(n.startswith("gp2d_") for n in res.feature_names)


def test_v34a_learns(v34a_run):
    res, tr_meta, _ = v34a_run
    assert res.oof_f1 > 0.55, res.oof_f1


def test_v92_winner(v34a_run):
    res, tr_meta, te_meta = v34a_run
    # rebuild matrices from the v34a assembly for the v92 stage
    tr_bundle = pipelines.extract_v34a_bundle(
        *_packed_meta(tr_meta, seed=11, n=260), gp_steps=60)
    te_bundle = pipelines.extract_v34a_bundle(
        *_packed_meta(te_meta, seed=12, n=140), gp_steps=60)
    X_tr, names = pipelines.assemble_v34a_matrix(tr_bundle, res.selection.selected)
    X_te, _ = pipelines.assemble_v34a_matrix(te_bundle, res.selection.selected)

    out = pipelines.run_v92(X_tr, tr_meta.target, names, X_te,
                            params=FAST,
                            variants={"v92d_baseline_adv":
                                      {"gamma": 0.0, "use_scale_pos_weight": True},
                                      "v92b_focal_adv_g2_a85":
                                      {"gamma": 2.0, "alpha": 0.85}})
    assert set(pipelines.SHIFT_FEATURES).isdisjoint(out.feature_names)
    # 224 minus however many shift features the (data-dependent) selection
    # actually included — the reference run had both, giving its 222
    n_shift = sum(n in names for n in pipelines.SHIFT_FEATURES)
    assert len(out.feature_names) == 224 - n_shift
    winner = out.variants["v92d_baseline_adv"]
    assert winner.best_f1 > 0.55, winner.best_f1
    focal = out.variants["v92b_focal_adv_g2_a85"]
    assert np.isfinite(focal.best_f1)
    # same-distribution splits: AUC ~0.5, can dip below by small-n noise
    assert 0.3 <= out.adversarial.auc <= 1.0
    # same-distribution synthetic splits: weights may be uniform or mild
    assert out.adversarial.sample_weights.min() >= 0.5
    assert out.adversarial.sample_weights.max() <= 2.0


def _packed_meta(meta, seed, n):
    packed, meta2, _ = generate_dataset(n, seed=seed, tde_frac=0.12)
    return packed, meta2
