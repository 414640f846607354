"""Sharded pipeline == single-device pipeline.

extraction: placing the packed arrays with NamedSharding(P('obj')) and
letting XLA partition the vmapped kernels must produce the same features
as the host-chunked single-device path (zero-communication object-batch
data parallelism, SURVEY.md §2.2).
"""

import numpy as np
import pytest

from mallorn_tpu.data.packing import unify_time_padding
from mallorn_tpu.data.synthetic import generate_competition_splits
from mallorn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def splits():
    (tr_p, tr_m, _), (te_p, te_m, _) = generate_competition_splits(
        48, 32, seed=21, tde_frac=0.2)
    tr_p, te_p = unify_time_padding(tr_p, te_p)
    return tr_p, tr_m, te_p, te_m


@pytest.mark.slow
def test_sharded_extraction_matches_single_device(splits):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.pipeline import extract_v34a_bundle_sharded
    from mallorn_tpu.train.pipelines import extract_v34a_bundle

    tr_p, tr_m, *_ = splits
    mesh = make_mesh(8)
    sharded = extract_v34a_bundle_sharded(mesh, tr_p, tr_m, gp_steps=5)
    single = extract_v34a_bundle(tr_p, tr_m, gp_steps=5)

    for fam in ("features_v4", "tde_physics", "multiband_gp"):
        assert set(sharded[fam]) == set(single[fam]), fam
        for k in single[fam]:
            np.testing.assert_allclose(
                np.asarray(sharded[fam][k]), np.asarray(single[fam][k]),
                rtol=2e-4, atol=1e-5, equal_nan=True,
                err_msg=f"{fam}/{k}")

    # bazin params come from 60 iterations of LM: lanes near a fit
    # bifurcation can flip under different op fusion/layouts, so the gate
    # is distribution-level (like the scipy chi2 gates), not per-iterate
    for k in single["bazin"]:
        a = np.asarray(sharded["bazin"][k])
        b = np.asarray(single["bazin"][k])
        both_nan = np.isnan(a) & np.isnan(b)
        close = np.isclose(a, b, rtol=1e-3, atol=1e-4) | both_nan
        assert close.mean() >= 0.85, (k, close.mean())


@pytest.mark.slow  # the driver's dryrun_multichip exercises this every round
def test_v92d_pipeline_runs_on_mesh(splits):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.pipeline import run_v92d_pipeline_sharded
    from mallorn_tpu.train.adversarial import ADV_PARAMS
    from mallorn_tpu.train.pipelines import V34A_PARAMS

    tr_p, tr_m, te_p, te_m = splits
    params = V34A_PARAMS._replace(n_rounds=10, max_depth=3)
    out, _ = run_v92d_pipeline_sharded(
        mesh=make_mesh(8), train_packed=tr_p, train_meta=tr_m,
        test_packed=te_p, test_meta=te_m, params=params,
        selection_params=params, gp_steps=5, top_k=40,
        adv_params=ADV_PARAMS._replace(n_rounds=8))
    assert np.isfinite(out.winner.best_f1)
    assert np.isfinite(out.winner.test_preds).all()
    assert out.adversarial.sample_weights.min() >= 0.5


@pytest.mark.slow
def test_sharded_chunked_extraction_matches_unchunked(splits):
    """chunk_size bounds HBM at scale; chunking must not change features
    (shard-aligned chunks, padded tail trimmed)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.pipeline import extract_v34a_bundle_sharded

    tr_p, tr_m, *_ = splits
    mesh = make_mesh(8)
    whole = extract_v34a_bundle_sharded(mesh, tr_p, tr_m, gp_steps=5)
    # 48 objects in chunks of 16 (3 full chunks) and 40 (padded tail)
    for cs in (16, 40):
        chunked = extract_v34a_bundle_sharded(mesh, tr_p, tr_m, gp_steps=5,
                                              chunk_size=cs)
        for fam in ("features_v4", "tde_physics", "multiband_gp", "bazin"):
            assert set(chunked[fam]) == set(whole[fam])
            fracs = []
            for k in whole[fam]:
                a, b = np.asarray(chunked[fam][k]), np.asarray(whole[fam][k])
                assert a.shape == b.shape, (fam, k)
                both_nan = np.isnan(a) & np.isnan(b)
                rt, at = (1e-3, 1e-4) if fam == "bazin" else (1e-4, 1e-5)
                close = np.isclose(a, b, rtol=rt, atol=at) | both_nan
                fracs.append(close.mean())
                # bazin params come from 60 LM iterations: lanes near a
                # fit bifurcation flip under different batch layouts, and
                # cross-band consistency aggregates amplify single flips —
                # distribution-level gates like the sharded-vs-single test.
                # multiband_gp: count-sorted chunks give each chunk its own
                # time-compaction width, so reduction order through the
                # Cholesky + Adam chain differs per chunk — knife-edge
                # lanes can drift past rtol (same property as the
                # single-device count-sorted path); mass divergence is
                # still gated by the per-key floor + family mean below
                gate = {"bazin": 0.6, "multiband_gp": 0.90}.get(fam, 0.98)
                assert close.mean() >= gate, (fam, k, cs, close.mean())
            if fam == "bazin":
                assert np.mean(fracs) >= 0.9, (cs, np.mean(fracs))
            if fam == "multiband_gp":
                assert np.mean(fracs) >= 0.97, (cs, np.mean(fracs))


@pytest.mark.slow
def test_v92d_pipeline_runs_on_multislice_mesh(splits):
    """The ENTIRE winning pipeline on a 2-axis (dcn x obj) multi-slice
    mesh: objects/rows shard over the joint axes by default (axis=None ->
    all mesh axes), extraction runs shard-local, histogram all-reduces
    span both axes. Trainer-level identical-trees on this mesh is pinned
    in test_sharded_training.py; here the end-to-end path must run and
    agree with the 1-D mesh result."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.mesh import make_mesh_2d
    from mallorn_tpu.parallel.pipeline import run_v92d_pipeline_sharded
    from mallorn_tpu.train.adversarial import ADV_PARAMS
    from mallorn_tpu.train.pipelines import V34A_PARAMS

    tr_p, tr_m, te_p, te_m = splits
    params = V34A_PARAMS._replace(n_rounds=10, max_depth=3)
    kw = dict(train_packed=tr_p, train_meta=tr_m, test_packed=te_p,
              test_meta=te_m, params=params, selection_params=params,
              gp_steps=5, top_k=40, adv_params=ADV_PARAMS._replace(n_rounds=8))
    out2d, _ = run_v92d_pipeline_sharded(mesh=make_mesh_2d(2, 4), **kw)
    out1d, _ = run_v92d_pipeline_sharded(mesh=make_mesh(8), **kw)
    assert np.isfinite(out2d.winner.best_f1)
    assert np.isfinite(out2d.winner.test_preds).all()
    # same trees -> same OOF F1/threshold as the 1-D mesh
    assert out2d.winner.best_f1 == pytest.approx(out1d.winner.best_f1,
                                                 abs=1e-6)
    np.testing.assert_allclose(out2d.winner.test_preds,
                               out1d.winner.test_preds, rtol=5e-4, atol=5e-4)
