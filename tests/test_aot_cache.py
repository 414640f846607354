"""AOT executable cache: key correctness + prefetch manifest mechanics.

Round-2 advisor finding (high): the ``gbdt_folds`` cache tag ignored the
closed-over static config, so two same-shaped fits with different
grow_policy / objective / early_stop loaded each other's executables
(wrong model family, silently). The tag must separate every static config.
"""

import numpy as np
import pytest

from mallorn_tpu.trees import objectives
from mallorn_tpu.trees.gbdt import GBDTParams, _folds_cache_tag
from mallorn_tpu.utils import aot_cache


V34A = GBDTParams(n_rounds=500, max_depth=5, learning_rate=0.025,
                  subsample=0.8, colsample_bytree=0.8,
                  min_child_weight=3.0, reg_alpha=0.2, reg_lambda=1.5)
V118 = GBDTParams(n_rounds=500, max_depth=5, learning_rate=0.03,
                  subsample=0.8, colsample_bytree=1.0,
                  min_child_weight=1e-3, reg_alpha=0.0, reg_lambda=3.0,
                  grow_policy="symmetric")


def test_grow_policy_separates_cache_tags():
    # v119 trains a depthwise and a symmetric base back-to-back on the
    # same matrix: identical argument signatures, different executables
    t_xgb = _folds_cache_tag(V34A, objectives.logistic, 50)
    t_cat = _folds_cache_tag(V118, objectives.logistic, 50)
    assert t_xgb != t_cat


def test_objective_separates_cache_tags():
    # v92 a/b/c differ only in the closed-over focal objective
    tags = {
        _folds_cache_tag(V34A, objectives.logistic, 50),
        _folds_cache_tag(V34A, objectives.make_focal(1.0, 0.85), 50),
        _folds_cache_tag(V34A, objectives.make_focal(2.0, 0.85), 50),
        _folds_cache_tag(V34A, objectives.make_focal(2.0, 0.90), 50),
    }
    assert len(tags) == 4


def test_early_stop_and_seed_normalization():
    assert (_folds_cache_tag(V34A, objectives.logistic, 50)
            != _folds_cache_tag(V34A, objectives.logistic, 0))
    # seed is a traced argument; it must NOT fragment the cache
    assert (_folds_cache_tag(V34A._replace(seed=1), objectives.logistic, 50)
            == _folds_cache_tag(V34A._replace(seed=2), objectives.logistic, 50))


def test_focal_closures_have_distinct_identity():
    f1 = objectives.make_focal(1.0, 0.85)
    f2 = objectives.make_focal(2.0, 0.85)
    assert f1.__qualname__ != f2.__qualname__
    # lru-cached: identical config returns the identical closure (no
    # recompile when the same variant is requested twice)
    assert objectives.make_focal(1.0, 0.85) is f1


def test_manifest_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(aot_cache, "_bucket_hash", lambda b: "f" * 64)
    aot_cache._manifest_add(tmp_path, "a.aotx", "gbdt_folds_x")
    aot_cache._manifest_add(tmp_path, "b.aotx", "gbdt_folds_x")
    aot_cache._manifest_add(tmp_path, "a.aotx", "gbdt_folds_x")  # dedupe
    mp = aot_cache._manifest_path(tmp_path, "gbdt")
    assert mp.read_text().split() == ["a.aotx", "b.aotx"]


def test_bucket_keying_isolates_subsystems():
    """feat_* executables must not be invalidated by trees/ edits: the
    buckets hash disjoint-enough source sets, and mesh tags add parallel/."""
    assert aot_cache._bucket_id("gbdt_folds_abc") == "gbdt"
    assert aot_cache._bucket_id("gbdt_folds_abc_mesh1_mesh") == "gbdtmesh"
    assert aot_cache._bucket_id("feat_colors") == "feat"
    assert aot_cache._bucket_id("gp2d") == "feat"
    assert aot_cache._bucket_id("something_else") == "full"
    h = {b: aot_cache._bucket_hash(b) for b in aot_cache._all_buckets()}
    assert len(set(h.values())) == len(h)  # all distinct source sets


def test_prefetch_prunes_stale_generations(tmp_path, monkeypatch):
    monkeypatch.setattr(aot_cache, "_bucket_hash", lambda b: "f" * 64)
    monkeypatch.setattr(aot_cache, "cache_dir", lambda: tmp_path)
    (tmp_path / "cur.aotx").write_bytes(b"not-a-real-payload")
    (tmp_path / "old.aotx").write_bytes(b"stale")
    (tmp_path / "manifest_full_0123456789abcdef.txt").write_text("old.aotx\n")
    aot_cache._manifest_add(tmp_path, "cur.aotx", "feat_colors")

    aot_cache.prefetch(max_workers=1)
    import time

    # wait for background loads to settle (they fail on the fake payload,
    # which is exactly the degrade-to-recompile path)
    for _ in range(50):
        futs = list(aot_cache._PREFETCHED.values())
        if all(getattr(f, "done", lambda: True)() for f in futs):
            break
        time.sleep(0.05)
    assert (tmp_path / "cur.aotx").exists()
    assert not (tmp_path / "old.aotx").exists()
    assert not (tmp_path / "manifest_full_0123456789abcdef.txt").exists()
