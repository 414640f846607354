"""CLI (L6) end-to-end coverage: every config of `mallorn train` executes
on a tiny synthetic workspace (synth -> extract -> train -> predict).

The CLI is the framework's entire user surface (SURVEY.md §1 L6 — the
reference's 166 versioned scripts); a regression in cmd_train's config
dispatch must not ship silently (VERDICT r2 weak #3). Runs in the slow
tier; configs share one extracted feature cache and run at --rounds 12.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from mallorn_tpu.cli.main import main

pytestmark = pytest.mark.slow

ALL_CONFIGS = ["baseline", "v9", "v10", "v13", "v14", "v19", "v20", "v22", "v26",
               "v27", "v30", "v34a",
               "v35", "v40", "v42", "v45", "v47", "v48",
               "v55", "v56", "v57", "v58", "v59b",
               "v60", "v62", "v64", "v65", "v66",
               "v92", "v92a", "v92b", "v92c", "v92d", "v93", "v97",
               "v102a", "v102b", "v102c", "v103", "v103a", "v103c",
               "v104", "v105", "v106", "v108",
               "v110", "v111", "v114d", "v115c", "v118", "v119", "kaggle"]


_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _bound_xla_state_within_module():
    """Drop in-memory XLA executables every few tests.

    This module runs 50+ full CLI trainings in one process; past ~50 the
    accumulated XLA:CPU executable state segfaults/aborts the process
    inside the compile path (observed twice at test ~54, once on cache
    read and once on cache write). The per-MODULE clear in conftest.py
    never fires inside this module, so clear periodically here; the
    persistent disk cache makes re-loading cheap."""
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % 8 == 0:
        import jax

        jax.clear_caches()


N_TRAIN = 120
N_TEST = int(N_TRAIN * 2.33)  # cmd_synth's test-split sizing

# the families the train configs consume; every feature family is also
# covered by its own feature-module tests
TRAIN_FAMILIES = ("features_v4,tde_physics,multiband_gp,bazin,"
                  "research,powerlaw,powerlaw_ratio,peak_ordering,fwhm,"
                  "temp_fwhm,dtw,advanced,advanced_physics,cesium,fourier,"
                  "enhanced_colors,time_to_decline,blackbody,high_snr,"
                  "astromer")


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli_ws")
    data, cache = ws / "data", ws / "cache"
    main(["synth", "--out", str(data), "--n-objects", str(N_TRAIN),
          "--seed", "5"])
    main(["extract", "--data", str(data), "--cache", str(cache),
          "--families", TRAIN_FAMILIES, "--gp-steps", "8"])
    return ws


def _train(workspace, config, rounds="12"):
    out = workspace / f"artifacts_{config}"
    main(["train", "--data", str(workspace / "data"),
          "--cache", str(workspace / "cache"),
          "--config", config, "--out", str(out), "--rounds", rounds])
    return out


@pytest.mark.parametrize("config", ALL_CONFIGS)
def test_train_config_end_to_end(workspace, config):
    out = _train(workspace, config)

    result_file = out / f"result_{config}.json"
    assert result_file.exists(), f"{config}: no result json written"
    result = json.loads(result_file.read_text())
    # DL baselines (v10/v13/v22) report a holdout val_f1 instead of an
    # OOF F1 (80/20 split, not K-fold)
    f1_key = "val_f1" if config in ("v10", "v13", "v22", "v27") else "oof_f1"
    assert np.isfinite(result[f1_key]), f"{config}: non-finite {f1_key}"
    assert 0.0 <= result[f1_key] <= 1.0
    assert np.isfinite(result["threshold"])

    sub = out / f"submission_{config}.csv"
    assert sub.exists(), f"{config}: no submission written"
    lines = sub.read_text().strip().splitlines()
    assert len(lines) == 1 + N_TEST  # header + test objects
    preds = np.array([int(l.rsplit(",", 1)[1]) for l in lines[1:]])
    assert set(np.unique(preds)) <= {0, 1}


def test_predict_from_saved_models(workspace):
    """mallorn predict serves from the v34a fold models saved by train."""
    out = _train(workspace, "v34a")
    model_dir = out / "models_v34a"
    assert model_dir.exists()
    pred_out = workspace / "pred_out"
    main(["predict", "--data", str(workspace / "data"),
          "--cache", str(workspace / "cache"),
          "--model", str(model_dir), "--split", "test",
          "--out", str(pred_out)])
    probs = np.load(pred_out / "probs_test.npy")
    assert probs.shape == (N_TEST,)
    assert np.isfinite(probs).all() and (probs >= 0).all() and (probs <= 1).all()
    assert (pred_out / "submission_test.csv").exists()


def test_console_entrypoint_subprocess(workspace):
    """The installed-style entry point works as an actual process.

    The child runs on CPU: stripping PALLAS_AXON_POOL_IPS stops the
    sitecustomize TPU-backend registration (a dead tunnel would hang the
    fresh process forever — this test is about entrypoint plumbing, not
    the backend)."""
    import os

    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "mallorn_tpu.cli.main", "train",
         "--data", str(workspace / "data"),
         "--cache", str(workspace / "cache"),
         "--config", "baseline", "--rounds", "8",
         "--out", str(workspace / "artifacts_subproc")],
        capture_output=True, text=True, timeout=900,
        cwd=Path(__file__).parent.parent, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (workspace / "artifacts_subproc" / "result_baseline.json").exists()


def test_train_v16_external_combination(workspace, tmp_path_factory):
    """v16: external labeled data joins every fold's training rows;
    validation/OOF stay on the primary data."""
    ext = tmp_path_factory.mktemp("cli_ext")
    ext_data, ext_cache = ext / "data", ext / "cache"
    main(["synth", "--out", str(ext_data), "--n-objects", "80", "--seed", "77"])
    main(["extract", "--data", str(ext_data), "--cache", str(ext_cache),
          "--families", "features_v4,tde_physics,multiband_gp,bazin",
          "--gp-steps", "8"])
    out = workspace / "artifacts_v16"
    main(["train", "--data", str(workspace / "data"),
          "--cache", str(workspace / "cache"),
          "--config", "v16", "--out", str(out), "--rounds", "12",
          "--data-external", str(ext_data),
          "--cache-external", str(ext_cache)])
    result = json.loads((out / "result_v16.json").read_text())
    assert result["n_external"] == 80
    assert np.isfinite(result["oof_f1"])


def test_set_override_changes_training(workspace):
    """--set applies GBDTParams deltas (the reference's regularization
    variants v8/v28a/v29a/v81 as a flag): max_depth=2 must change the OOF
    probabilities vs the default depth-5 run, and an unknown key errors."""
    out_a = _train(workspace, "v34a")
    res_a = json.loads((out_a / "result_v34a.json").read_text())

    out_b = workspace / "artifacts_v34a_set"
    main(["train", "--data", str(workspace / "data"),
          "--cache", str(workspace / "cache"),
          "--config", "v34a", "--out", str(out_b), "--rounds", "12",
          "--set", "max_depth=2,reg_lambda=5.0"])
    res_b = json.loads((out_b / "result_v34a.json").read_text())
    assert res_a != res_b  # different trees -> different OOF/threshold

    with pytest.raises(SystemExit, match="unknown GBDTParams field"):
        main(["train", "--data", str(workspace / "data"),
              "--cache", str(workspace / "cache"),
              "--config", "v34a", "--out", str(out_b), "--rounds", "2",
              "--set", "not_a_field=1"])

    # malformed values error cleanly, not with a raw ValueError traceback
    for bad in ("max_depth=2.5", "reg_lambda=abc", "max_depth=nan",
                "learning_rate=inf", "hist_subtract=ture",
                "use_pallas_hist=maybe"):
        with pytest.raises(SystemExit, match="--set"):
            main(["train", "--data", str(workspace / "data"),
                  "--cache", str(workspace / "cache"),
                  "--config", "v34a", "--out", str(out_b), "--rounds", "2",
                  "--set", bad])


def test_mesh_flag_identical_result(workspace):
    """--mesh N trains every CV distributed (default-mesh plumbing):
    identical forests -> identical result JSON to the single-device run,
    and the process default mesh does not leak past the invocation."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from mallorn_tpu.parallel.mesh import default_mesh

    out_a = _train(workspace, "v34a")
    res_a = json.loads((out_a / "result_v34a.json").read_text())

    out_b = workspace / "artifacts_v34a_mesh"
    main(["train", "--data", str(workspace / "data"),
          "--cache", str(workspace / "cache"),
          "--config", "v34a", "--out", str(out_b), "--rounds", "12",
          "--mesh", "8"])
    res_b = json.loads((out_b / "result_v34a.json").read_text())
    assert res_a == res_b
    assert default_mesh() is None  # scoped to the invocation

    with pytest.raises(SystemExit, match="devices available"):
        main(["train", "--data", str(workspace / "data"),
              "--cache", str(workspace / "cache"),
              "--config", "v34a", "--out", str(out_b), "--rounds", "2",
              "--mesh", "64"])
