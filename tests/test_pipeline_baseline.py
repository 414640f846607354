"""Integration: the baseline pipeline learns TDE vs non-TDE on synthetic
data end-to-end (features -> CV GBDT -> threshold sweep)."""

import numpy as np
import pytest

from mallorn_tpu.data.synthetic import generate_dataset
from mallorn_tpu.train.pipelines import run_baseline
from mallorn_tpu.trees.gbdt import GBDTParams


@pytest.mark.slow
def test_baseline_pipeline_learns():
    packed, meta, _ = generate_dataset(n_objects=400, seed=42, tde_frac=0.12)
    params = GBDTParams(n_rounds=120, max_depth=5, learning_rate=0.1,
                        subsample=0.8, colsample_bytree=0.8)
    res = run_baseline(packed, meta, params=params)
    # Synthetic TDEs are separable by design; the pipeline must find them.
    assert res.oof_f1 > 0.55, res.oof_f1
    assert 0.05 <= res.threshold <= 0.5
    assert len(res.feature_names) == 127


@pytest.mark.slow
def test_baseline_pipeline_with_test_split():
    tr_packed, tr_meta, _ = generate_dataset(n_objects=300, seed=1, tde_frac=0.12)
    te_packed, te_meta, _ = generate_dataset(n_objects=150, seed=2, tde_frac=0.12)
    params = GBDTParams(n_rounds=80, max_depth=4, learning_rate=0.1)
    res = run_baseline(tr_packed, tr_meta, te_packed, te_meta, params=params)
    assert res.test_binary is not None and len(res.test_binary) == 150
    # test-set F1 against known synthetic labels should track OOF quality
    from sklearn.metrics import f1_score
    f1 = f1_score(te_meta.target, res.test_binary)
    assert f1 > 0.4, (f1, res.oof_f1)
