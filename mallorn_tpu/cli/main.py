"""mallorn — single CLI entry point.

Replaces the reference's 166 versioned scripts (SURVEY.md §5.6) with one
declarative interface:

  mallorn synth    --out data/ --n-objects 1000        make synthetic data
  mallorn extract  --data data/ --cache cache/          feature extraction
  mallorn train    --data data/ --cache cache/ --config v92d
  mallorn predict  --data data/ --cache cache/ --model artifacts/
Configs: baseline | v16 | v19 | v34a | v42 | v55 | v56 | v57 | v58 | v59b | v60 | v62 | v92a..d |
v97 | v102a..c | v104 | v108 | v110 | v111 | v114d | v115c | v118 | v119 | kaggle
(BASELINE.json's list plus the LGBM/CatBoost-family, multiclass,
soft-label, external-data-combination and stacking runs; `kaggle` is the
final shipped deliverable — 3 models x 5 seeds, LB-weighted blend).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _log(msg):
    print(msg, flush=True)


def cmd_synth(args):
    from mallorn_tpu.data.synthetic import generate_dataset, write_reference_layout

    for split, n, seed in (("train", args.n_objects, args.seed),
                           ("test", int(args.n_objects * 2.33), args.seed + 1)):
        _, meta, cols = generate_dataset(n, seed=seed, tde_frac=0.05)
        write_reference_layout(args.out, cols, meta, split=split)
        _log(f"wrote {split}: {n} objects under {args.out}")


FAMILIES = ("features_v4", "tde_physics", "multiband_gp", "bazin",
            "research", "powerlaw", "powerlaw_ratio", "tde_models",
            "time_to_decline", "fourier", "enhanced_colors", "high_snr",
            "cesium", "gp1d", "peak_ordering", "fwhm", "temp_fwhm",
            "advanced", "advanced_physics", "blackbody", "dtw", "astromer")


def _extract_family(family, packed, meta, gp_steps, dtw_templates=None):
    from mallorn_tpu.features import (advanced, advanced_physics, bazin,
                                      blackbody, cesium, dtw, enhanced_colors,
                                      fourier, fwhm, gp1d, high_snr,
                                      multiband_gp, peak_ordering, powerlaw,
                                      powerlaw_ratio, research, tde,
                                      tde_models, temp_fwhm, time_to_decline)
    from mallorn_tpu.features.base import chunked_extract
    from mallorn_tpu.train.pipelines import extract_features_v4

    if family == "features_v4":
        return extract_features_v4(packed, meta)
    if family == "multiband_gp":
        return multiband_gp.extract(packed, meta, n_steps=gp_steps)
    # these vmap the full batch internally (no per-chunk dispatch needed)
    if family == "astromer":
        from mallorn_tpu.features import astromer
        return astromer.extract(packed, meta)
    if family == "advanced":
        return advanced.extract(packed, meta)
    if family == "advanced_physics":
        return advanced_physics.extract(packed, meta)
    if family == "blackbody":
        return blackbody.extract(packed, meta)
    if family == "dtw":
        if dtw_templates is None:
            raise ValueError("dtw extraction needs templates built from the "
                             "labeled train split (dtw.build_templates)")
        return dtw.extract(packed, dtw_templates, meta)
    table = {
        "tde_physics": (tde.extract, ()),
        "bazin": (bazin.extract, ()),
        "research": (research.extract, (meta,)),
        "powerlaw": (powerlaw.extract, ()),
        "powerlaw_ratio": (powerlaw_ratio.extract, ()),
        "tde_models": (tde_models.extract, ()),
        "time_to_decline": (time_to_decline.extract, ()),
        "fourier": (fourier.extract, ()),
        "enhanced_colors": (enhanced_colors.extract, ()),
        "high_snr": (high_snr.extract, ()),
        "cesium": (cesium.extract, ()),
        "gp1d": (gp1d.extract, ()),
        "peak_ordering": (peak_ordering.extract, ()),
        "fwhm": (fwhm.extract, ()),
        "temp_fwhm": (temp_fwhm.extract, ()),
    }
    if family not in table:
        raise ValueError(f"unknown family {family}")
    fn, args = table[family]
    return chunked_extract(fn, packed, *args)


def cmd_extract(args):
    from mallorn_tpu.data.loader import load_all_data
    from mallorn_tpu.io.cache import save_features

    data = load_all_data(Path(args.data))
    cache = Path(args.cache)
    families = args.families.split(",") if args.families else FAMILIES
    # DTW class templates come from the LABELED train split and are shared
    # by both splits (reference src/features/dtw_features.py:91-150 builds
    # them from train medians and reuses them for test extraction).
    dtw_templates = None
    if "dtw" in families and "train_packed" in data:
        from mallorn_tpu.features.dtw import build_templates
        dtw_templates = build_templates(data["train_packed"],
                                        data["train_meta"].target)
    for split in ("train", "test"):
        if f"{split}_packed" not in data:
            continue
        packed, meta = data[f"{split}_packed"], data[f"{split}_meta"]
        for family in families:
            t0 = time.perf_counter()
            feats = _extract_family(family, packed, meta, args.gp_steps,
                                    dtw_templates=dtw_templates)
            save_features(cache / f"{family}_{split}.npz", feats, meta.object_ids)
            _log(f"{split}/{family}: {len(feats)} features "
                 f"in {time.perf_counter() - t0:.1f}s")


def _load_matrices(cache, split, families):
    from mallorn_tpu.io.cache import load_features

    mats, names = [], []
    for fam in families:
        m, n, _ = load_features(Path(cache) / f"{fam}_{split}.npz")
        mats.append(m)
        names.extend(n)
    return np.concatenate(mats, axis=1), names


def cmd_train(args):
    from mallorn_tpu.data.loader import load_all_data, load_metadata
    from mallorn_tpu.io.submission import write_submission
    from mallorn_tpu.train import pipelines
    from mallorn_tpu.train.cv import train_cv
    from mallorn_tpu.train.feature_selection import select_features

    if getattr(args, "mesh", None):
        import jax

        from mallorn_tpu.parallel.mesh import make_mesh, set_default_mesh

        n_dev = len(jax.devices())
        if args.mesh > n_dev:
            raise SystemExit(
                f"--mesh {args.mesh}: only {n_dev} devices available")
        set_default_mesh(make_mesh(args.mesh))

    log = load_metadata(Path(args.data), "train")
    y = log["target"].to_numpy()

    def R(params):
        """Apply --rounds and --set overrides to a GBDTParams.

        --set replaces the reference's dozens of param-delta scripts
        (train_v8_tuned.py, train_v28a_regularized.py,
        train_v29a_mild_reg.py, train_v81_stronger_regularization.py, …):
        any GBDTParams field by name, e.g.
        ``--set reg_lambda=5.0,subsample=0.7,max_depth=4``."""
        if args.rounds is not None:
            params = params._replace(n_rounds=args.rounds)
        for kv in (args.set.split(",") if args.set else ()):
            k, _, v = kv.partition("=")
            k = k.strip()
            if k not in params._fields:
                raise SystemExit(
                    f"--set: unknown GBDTParams field {k!r} "
                    f"(valid: {', '.join(params._fields)})")
            cur = getattr(params, k)
            v = v.strip()
            low = v.lower()
            if cur is None and low in ("true", "false", "yes", "no"):
                typ = bool  # Optional[bool] fields (use_pallas_hist, ...)
            else:
                typ = (type(cur) if cur is not None else
                       (float if "." in v else int))
            if typ is bool:
                if low in ("1", "true", "yes"):
                    val = True
                elif low in ("0", "false", "no"):
                    val = False
                else:
                    raise SystemExit(
                        f"--set: {k} is a boolean field, got {v!r} "
                        "(use true/false/1/0/yes/no)")
            elif isinstance(cur, str):
                val = v
            elif typ is int:
                try:
                    val = int(v, 10)  # exact (float() would round > 2^53)
                except ValueError:
                    raise SystemExit(
                        f"--set: {k} is an integer field, got {v!r}")
            else:
                import math

                try:
                    num = float(v)
                except ValueError:
                    raise SystemExit(
                        f"--set: {k}={v!r} is not a number "
                        f"(field type {typ.__name__})")
                if not math.isfinite(num):
                    raise SystemExit(
                        f"--set: {k}={v!r} must be finite")
                val = typ(num)
            params = params._replace(**{k: val})
        return params
    object_ids_test = None
    try:
        object_ids_test = load_metadata(Path(args.data), "test")["object_id"].to_numpy()
    except FileNotFoundError:
        pass

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.config == "baseline":
        Xtr, names = _load_matrices(args.cache, "train", ["features_v4"])
        Xte = None
        if object_ids_test is not None:
            Xte, _ = _load_matrices(args.cache, "test", ["features_v4"])
        Xtr = np.nan_to_num(Xtr, nan=0.0, posinf=0.0, neginf=0.0)
        Xte = np.nan_to_num(Xte, nan=0.0, posinf=0.0, neginf=0.0) if Xte is not None else None
        # XGB + leaf-wise LGBM on the same folds, 50/50 test blend at a
        # fixed 0.5 threshold (reference: train_baseline.py:169-303)
        cv = train_cv(Xtr, y, Xte, R(pipelines.BASELINE_PARAMS), verbose=True)
        lgbm_cv = train_cv(Xtr, y, Xte, R(pipelines.BASELINE_LGBM_PARAMS),
                           verbose=True)
        result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                  "lgbm_oof_f1": lgbm_cv.best_f1}
        test_preds = cv.test_preds
        if test_preds is not None:
            test_preds = 0.5 * cv.test_preds + 0.5 * lgbm_cv.test_preds
        threshold = 0.5
    else:
        # v19 predates the Bazin cache: selected_120 + tde + gp2d only
        # (reference: scripts/train_v19_multiband_gp.py:64-112)
        fams = (["features_v4", "tde_physics", "multiband_gp"]
                if args.config == "v19" else
                ["features_v4", "tde_physics", "multiband_gp", "bazin"])
        Xv4, v4_names = _load_matrices(args.cache, "train", ["features_v4"])
        Xv4 = pipelines._finite_or_nan(Xv4)
        # staged selection artifact under the feature cache — the
        # reference computes selection once and every script loads the
        # pickle (scripts/feature_selection.py:352-358,
        # train_v34a_bazin.py:59-68); content-digest keyed, so new data
        # or a --rounds change recomputes
        from mallorn_tpu.train.feature_selection import cached_select_features
        from mallorn_tpu.utils.aot_cache import config_digest

        sel_params = R(pipelines.V34A_PARAMS._replace(n_rounds=200))
        selection = cached_select_features(
            Path(args.cache) / "selected_features.npz", Xv4, y, v4_names,
            lambda: train_cv(Xv4, y, None, sel_params).importance_gain,
            120, key_extra=config_digest(sel_params))

        sel_idx = [v4_names.index(n) for n in selection.selected]
        Xtr_all, all_names = _load_matrices(args.cache, "train", fams)
        keep = sel_idx + list(range(len(v4_names), len(all_names)))
        names = [all_names[i] for i in keep]
        Xtr = pipelines._finite_or_nan(Xtr_all[:, keep])
        Xte = None
        if object_ids_test is not None:
            Xte_all, _ = _load_matrices(args.cache, "test", fams)
            Xte = pipelines._finite_or_nan(Xte_all[:, keep])

        if args.config in ("v34a", "v19"):
            cv = train_cv(Xtr, y, Xte, R(pipelines.V34A_PARAMS), verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_features": len(names)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
            from mallorn_tpu.io.model_store import save_cv_models
            save_cv_models(out_dir / f"models_{args.config}", cv.models,
                           cv.best_threshold, names)
        elif args.config == "v14":
            # residual MLP on the selected engineered features — the NN
            # ensemble member over the SAME tabular matrix the GBM
            # consumes (reference scripts/train_v14_nn_features.py:51-117,
            # 141-153: features_v4 cache + selected_features, 5-fold CV)
            from mallorn_tpu.models.mlp import train_mlp_cv

            Xte14 = None
            if object_ids_test is not None:
                Xte_v4, _ = _load_matrices(args.cache, "test", ["features_v4"])
                Xte14 = pipelines._finite_or_nan(Xte_v4)[:, sel_idx]
            n_ep = args.rounds if args.rounds is not None else 150
            out = train_mlp_cv(Xv4[:, sel_idx], y, Xte14, n_epochs=n_ep)
            result = {"oof_f1": out["best_f1"], "threshold": out["threshold"],
                      "n_features": len(sel_idx)}
            test_preds, threshold = out["test_preds"], out["threshold"]
        elif args.config in ("v110", "v111", "v118"):
            # regularized leaf-wise / DART / symmetric-tree GBM on the
            # v34a feature set (reference: train_v110_lgbm_regularized.py,
            # train_v111_lgbm_dart.py, train_v118_catboost.py)
            params = {"v110": pipelines.V110_PARAMS,
                      "v111": pipelines.V111_PARAMS,
                      "v118": pipelines.V118_PARAMS}[args.config]
            cv = train_cv(Xtr, y, Xte, R(params),
                          pad_features_to=pipelines.PAD_FEATURES, verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_features": len(names)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v119":
            # stacking: XGB + LGBM + CatBoost base CVs -> logistic meta
            # (reference: scripts/train_v119_stacking.py:33,139-163)
            from mallorn_tpu.train.ensembles import stack_oof

            bases = {}
            for nm, p in (("xgb", pipelines.V34A_PARAMS),
                          ("lgbm", pipelines.V110_PARAMS),
                          ("cat", pipelines.V118_PARAMS)):
                bases[nm] = train_cv(Xtr, y, Xte, R(p),
                                     pad_features_to=pipelines.PAD_FEATURES)
                print(f"  base {nm}: OOF F1={bases[nm].best_f1:.4f}")
            out = stack_oof([b.oof_preds for b in bases.values()], y,
                            test_preds=([b.test_preds for b in bases.values()]
                                        if Xte is not None else None))
            result = {"oof_f1": out["best_f1"], "threshold": out["threshold"],
                      "base_f1": {k: b.best_f1 for k, b in bases.items()}}
            test_preds, threshold = out["test_preds"], out["threshold"]
        elif args.config == "v60":
            # two-stage cautious-AGN-filter classifier
            # (reference: scripts/train_v60_two_stage.py:1-12)
            from mallorn_tpu.train.ensembles import two_stage

            out = two_stage(Xtr, y, Xte,
                            stage1_params=R(pipelines.V34A_PARAMS),
                            stage2_params=R(pipelines.V34A_PARAMS))
            result = {"oof_f1": out["best_f1"], "threshold": out["threshold"],
                      "n_filtered": out["n_filtered"]}
            test_preds, threshold = out["test_preds"], out["threshold"]
        elif args.config.startswith("v92"):
            key = {"v92": "v92d_baseline_adv", "v92d": "v92d_baseline_adv",
                   "v92a": "v92a_focal_adv_g1_a85", "v92b": "v92b_focal_adv_g2_a85",
                   "v92c": "v92c_focal_adv_g2_a90"}[args.config]
            # bare "v92" reproduces the full reference script (all four
            # objective variants in one run); vNN picks one variant
            variants = (pipelines.V92_VARIANTS if args.config == "v92"
                        else {key: pipelines.V92_VARIANTS[key]})
            out = pipelines.run_v92(Xtr, y, names, Xte, params=R(pipelines.V34A_PARAMS),
                                    variants=variants, verbose=True)
            cv = out.variants[key]
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "adv_auc": out.adversarial.auc,
                      "n_features": len(out.feature_names)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
            from mallorn_tpu.io.model_store import save_cv_models
            save_cv_models(out_dir / f"models_{args.config}", cv.models,
                           cv.best_threshold, out.feature_names)
            # v121 per-object error analysis on the winning OOF preds
            # (reference: scripts/train_v121_error_analysis.py)
            from mallorn_tpu.train.analysis import (error_analysis,
                                                    print_error_analysis)

            keep = [i for i, n in enumerate(names)
                    if n not in pipelines.SHIFT_FEATURES]
            report = error_analysis(
                y, cv.oof_preds, cv.best_threshold,
                X=Xtr[:, keep], feature_names=out.feature_names,
                importance_gain=cv.importance_gain,
                object_ids=log["object_id"].to_numpy(),
                z=log["Z"].to_numpy() if "Z" in log else None,
                spec_type=log["SpecType"].to_numpy() if "SpecType" in log else None,
                other_models={k: v.oof_preds
                              for k, v in out.variants.items() if k != key})
            print_error_analysis(report)
            result["confusion"] = report["confusion"]
            result["hard_tde_count"] = report["hard_tde_count"]
        elif args.config == "v104":
            # v92d feature set + adversarial weights, then 10-seed ensemble
            out = pipelines.run_v92(Xtr, y, names, Xte, params=R(pipelines.V34A_PARAMS),
                                    variants={"v92d_baseline_adv":
                                              {"gamma": 0.0, "use_scale_pos_weight": True}})
            keep = [i for i, n in enumerate(names)
                    if n not in pipelines.SHIFT_FEATURES]
            X92tr = pipelines._finite_or_nan(np.asarray(Xtr)[:, keep])
            X92te = pipelines._finite_or_nan(np.asarray(Xte)[:, keep])
            oof, test_preds, f1s = pipelines.run_seed_ensemble(
                X92tr, y, X92te, params=R(pipelines.V34A_PARAMS),
                sample_weight=out.adversarial.sample_weights, verbose=True)
            from mallorn_tpu.train.cv import threshold_sweep
            f1, threshold = threshold_sweep(y, oof, np.linspace(0.05, 0.5, 200))
            result = {"oof_f1": f1, "threshold": threshold, "seed_f1s": f1s}
        elif args.config == "v42":
            base = train_cv(Xtr, y, Xte, R(pipelines.V34A_PARAMS))
            cv = pipelines.run_pseudo_label(Xtr, y, Xte, base.test_preds,
                                            params=R(pipelines.V34A_PARAMS),
                                            verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v115c":
            from mallorn_tpu.io.cache import load_features
            r_tr, r_names, _ = load_features(Path(args.cache) / "research_train.npz")
            research_tr = {n: r_tr[:, i] for i, n in enumerate(r_names)}
            research_te = None
            if object_ids_test is not None:
                r_te, _, _ = load_features(Path(args.cache) / "research_test.npz")
                research_te = {n: r_te[:, i] for i, n in enumerate(r_names)}
            out = pipelines.run_v115(Xtr, y, names, research_tr, Xte,
                                     research_te, params=R(pipelines.V34A_PARAMS),
                                     verbose=True)
            cv = out.winner
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "adv_auc": out.adversarial.auc,
                      "n_features": len(out.feature_names)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v114d":
            # Optuna-tuned leaf-wise GBDT + minimal research features —
            # the LightGBM member of the shipped ensemble as a named,
            # reproducible config (reference:
            # scripts/package_features_for_kaggle.py:160-180 params,
            # scripts/train_v114_optimized_lgbm.py strategy)
            from mallorn_tpu.io.cache import load_features
            r_tr, r_names, _ = load_features(Path(args.cache) / "research_train.npz")
            research_tr = {n: r_tr[:, i] for i, n in enumerate(r_names)}
            research_te = None
            if object_ids_test is not None:
                r_te, _, _ = load_features(Path(args.cache) / "research_test.npz")
                research_te = {n: r_te[:, i] for i, n in enumerate(r_names)}
            out = pipelines.run_v115(Xtr, y, names, research_tr, Xte,
                                     research_te,
                                     extra=pipelines.V115_MINIMAL_RESEARCH,
                                     params=R(pipelines.V114D_PARAMS),
                                     verbose=True)
            cv = out.winner
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "adv_auc": out.adversarial.auc,
                      "n_features": len(out.feature_names)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "kaggle":
            # THE final deliverable: 3 models x 5 seeds, LB-weighted blend
            # (reference: notebooks/kaggle_multiseed_ensemble.py:1-35)
            from mallorn_tpu.io.cache import load_features
            r_tr, r_names, _ = load_features(Path(args.cache) / "research_train.npz")
            research_tr = {n: r_tr[:, i] for i, n in enumerate(r_names)}
            research_te = None
            if object_ids_test is not None:
                r_te, _, _ = load_features(Path(args.cache) / "research_test.npz")
                research_te = {n: r_te[:, i] for i, n in enumerate(r_names)}
            out = pipelines.run_kaggle_ensemble(
                Xtr, y, names, research_tr, Xte, research_te,
                xgb_params=R(pipelines.V34A_PARAMS),
                lgbm_params=R(pipelines.V114D_PARAMS), verbose=True)
            result = {"oof_f1": out.oof_f1, "threshold": out.threshold,
                      "weights": out.weights,
                      "adv_auc": out.adversarial.auc,
                      "model_f1s": {k: v["oof_f1"]
                                    for k, v in out.per_model.items()},
                      "model_thresholds": {k: v["threshold"]
                                           for k, v in out.per_model.items()}}
            test_preds, threshold = out.ensemble_test, out.threshold
            # per-model multiseed submissions alongside the main blend
            # (notebook :316-326 writes submission_{model}_multiseed.csv)
            if object_ids_test is not None:
                for mname, m in out.per_model.items():
                    if m["test"] is not None:
                        write_submission(
                            out_dir / f"submission_{mname}_multiseed.csv",
                            object_ids_test,
                            (m["test"] > m["threshold"]).astype(int))
        elif args.config == "v16":
            # external-data combination: train on primary + external
            # labeled set, folds/validation/OOF on primary only
            # (reference: scripts/prepare_plasticc_data.py +
            # train_v16_plasticc_combined.py:160-190)
            if not args.data_external or not args.cache_external:
                raise SystemExit("v16 needs --data-external and --cache-external")
            ext_log = load_metadata(Path(args.data_external), "train")
            y_ext = ext_log["target"].to_numpy()
            Xe_all, _ = _load_matrices(args.cache_external, "train", fams)
            Xe = pipelines._finite_or_nan(Xe_all[:, keep])
            cv = train_cv(Xtr, y, Xte, R(pipelines.V34A_PARAMS),
                          extra_train=(Xe, y_ext), verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_external": len(y_ext),
                      "external_tdes": int(y_ext.sum())}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v57":
            # dereddened color twins appended to the v34a backbone
            # (reference: scripts/train_v57_extinction_corrected.py:143-177)
            from mallorn_tpu.features.extinction import dered_matrix

            ebv_tr = log["EBV"].to_numpy()
            d_tr, d_names = dered_matrix(Xtr, names, ebv_tr)
            Xtr2 = pipelines._finite_or_nan(np.concatenate([Xtr, d_tr], axis=1))
            Xte2 = None
            if object_ids_test is not None:
                ebv_te = load_metadata(Path(args.data), "test")["EBV"].to_numpy()
                d_te, _ = dered_matrix(Xte, names, ebv_te)
                Xte2 = pipelines._finite_or_nan(
                    np.concatenate([Xte, d_te], axis=1))
            cv = train_cv(Xtr2, y, Xte2, R(pipelines.V34A_PARAMS),
                          pad_features_to=pipelines.PAD_FEATURES, verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_features": Xtr2.shape[1], "n_dered": len(d_names)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config in ("v9", "v20", "v26", "v30", "v35", "v40", "v47",
                             "v48", "v56", "v58", "v59b", "v64", "v65", "v66"):
            # script-level feature augmentation of the v34a backbone
            # (reference: scripts/train_v56_agn_peak_ordering.py:208-236,
            #  scripts/train_v58_fwhm.py:190-214, train_v59b_temp_at_fwhm.py,
            #  train_v65_powerlaw_ratio.py:47-170, train_v9_dtw.py,
            #  train_v20_advanced.py / train_v30_advanced_physics.py,
            #  train_v35_cesium.py, train_v40_fourier.py,
            #  train_v47_enhanced_colors.py, train_v48_time_to_decline.py,
            #  train_v64_blackbody_radius.py, train_v66_high_snr.py)
            # v26: pretrained astromer embeddings appended to the backbone
            # (reference: scripts/train_v26_astromer.py + pooled pretrained
            #  embeddings, src/features/astromer_embeddings.py)
            fam = {"v9": "dtw", "v20": "advanced", "v26": "astromer",
                   "v30": "advanced_physics",
                   "v35": "cesium", "v40": "fourier",
                   "v47": "enhanced_colors", "v48": "time_to_decline",
                   "v56": "peak_ordering", "v58": "fwhm",
                   "v59b": "temp_fwhm", "v64": "blackbody",
                   "v65": "powerlaw_ratio", "v66": "high_snr"}[args.config]
            p_tr, p_names = _load_matrices(args.cache, "train", [fam])
            Xtr2 = pipelines._finite_or_nan(np.concatenate([Xtr, p_tr], axis=1))
            Xte2 = None
            if object_ids_test is not None:
                p_te, _ = _load_matrices(args.cache, "test", [fam])
                Xte2 = pipelines._finite_or_nan(np.concatenate([Xte, p_te], axis=1))
            cv = train_cv(Xtr2, y, Xte2, R(pipelines.V34A_PARAMS),
                          pad_features_to=pipelines.PAD_FEATURES, verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_features": Xtr2.shape[1]}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v45":
            # physics-binned categorical columns appended to the backbone
            # (reference: src/features/catboost_categorical.py:21-159 +
            #  scripts/train_v45_catboost_categorical.py — the binning is the
            #  portable part; the trees consume the integer codes directly)
            from mallorn_tpu.features.categorical import add_categorical_features

            def _with_cats(X, nms):
                cats, cat_names = add_categorical_features(
                    dict(zip(nms, np.asarray(X, np.float64).T)))
                if not cat_names:
                    return X, []
                cols = np.stack([cats[c] for c in cat_names], axis=1)
                return np.concatenate([X, cols], axis=1), cat_names

            Xtr2, cat_names = _with_cats(Xtr, names)
            Xtr2 = pipelines._finite_or_nan(Xtr2)
            Xte2 = None
            if object_ids_test is not None:
                Xte2, _ = _with_cats(Xte, names)
                Xte2 = pipelines._finite_or_nan(Xte2)
            cv = train_cv(Xtr2, y, Xte2, R(pipelines.V34A_PARAMS),
                          pad_features_to=pipelines.PAD_FEATURES, verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_features": Xtr2.shape[1],
                      "n_categorical": len(cat_names)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v105":
            # physics-motivated interaction features, top-K by point-biserial
            # correlation on TRAIN, appended to the backbone (reference:
            # src/features/interactions.py:23-196 + train_v105 runs)
            from mallorn_tpu.features.interactions import (
                create_physics_interactions, select_top_interactions)

            tr_feats = dict(zip(names, np.asarray(Xtr, np.float64).T))
            inter_tr = create_physics_interactions(tr_feats)
            keep = select_top_interactions(inter_tr, y, top_k=30)
            if keep:
                Xtr2 = np.concatenate(
                    [Xtr, np.stack([inter_tr[k] for k in keep], axis=1)], axis=1)
            else:
                Xtr2 = Xtr
            Xtr2 = pipelines._finite_or_nan(Xtr2)
            Xte2 = None
            if object_ids_test is not None:
                inter_te = create_physics_interactions(
                    dict(zip(names, np.asarray(Xte, np.float64).T)))
                Xte2 = (np.concatenate(
                    [Xte, np.stack([inter_te[k] for k in keep], axis=1)], axis=1)
                    if keep else Xte)
                Xte2 = pipelines._finite_or_nan(Xte2)
            cv = train_cv(Xtr2, y, Xte2, R(pipelines.V34A_PARAMS),
                          pad_features_to=pipelines.PAD_FEATURES, verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_features": Xtr2.shape[1],
                      "n_interactions": len(keep)}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v55":
            p_tr, p_names = _load_matrices(args.cache, "train", ["powerlaw"])
            Xtr2 = pipelines._finite_or_nan(np.concatenate([Xtr, p_tr], axis=1))
            Xte2 = None
            if object_ids_test is not None:
                p_te, _ = _load_matrices(args.cache, "test", ["powerlaw"])
                Xte2 = pipelines._finite_or_nan(np.concatenate([Xte, p_te], axis=1))
            cv = train_cv(Xtr2, y, Xte2, R(pipelines.V34A_PARAMS),
                          pad_features_to=pipelines.PAD_FEATURES, verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "n_features": Xtr2.shape[1]}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v62":
            # 4-class multi:softprob head -> class-probability features ->
            # final binary classifier (reference:
            # scripts/train_v62_multiclass_ensemble.py)
            if "SpecType" not in log:
                raise SystemExit("v62 needs SpecType in the train log")
            out62 = pipelines.run_v62(
                Xtr, y, log["SpecType"].to_numpy(), names, Xte,
                mc_params=R(pipelines.V62_MC_PARAMS),
                params=R(pipelines.V34A_PARAMS), verbose=True)
            result = {"oof_f1": out62.oof_f1, "threshold": out62.threshold,
                      "mc_tde_f1": out62.mc_tde_f1,
                      "mc_classes": out62.mc_classes,
                      "n_features": len(out62.feature_names)}
            test_preds, threshold = out62.cv.test_preds, out62.threshold
        elif args.config.startswith("v102"):
            # label-smoothing regression (reference:
            # train_v102_label_smoothing.py; a/b/c = eps .01/.05/.10)
            eps = {"v102": 0.05, "v102a": 0.01, "v102b": 0.05,
                   "v102c": 0.10}[args.config]
            cv = pipelines.run_label_smoothing(
                Xtr, y, Xte, epsilon=eps,
                params=R(pipelines.SOFT_LABEL_PARAMS), verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "epsilon": eps}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v97":
            # soft pseudo-labels from a v34a teacher (reference:
            # train_v97_soft_pseudo.py, v97b shape: threshold .90)
            base = train_cv(Xtr, y, Xte, R(pipelines.V34A_PARAMS))
            cv = pipelines.run_soft_pseudo(
                Xtr, y, Xte, base.test_preds,
                params=R(pipelines.SOFT_LABEL_PARAMS), verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "teacher_oof_f1": base.best_f1}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v108":
            # knowledge distillation from a v34a teacher (reference:
            # train_v108_knowledge_distillation.py, v108a shape: T=1 a=.5)
            teacher = train_cv(Xtr, y, Xte, R(pipelines.V34A_PARAMS))
            cv = pipelines.run_distillation(
                Xtr, y, teacher.oof_preds, Xte,
                params=R(pipelines.SOFT_LABEL_PARAMS), verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "teacher_oof_f1": teacher.best_f1}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v93":
            # EasyEnsemble: balanced undersampled model ensemble
            # (reference: train_v93_easy_ensemble.py, v93a shape: 10
            # models, 1:1 balance)
            cv = pipelines.run_easy_ensemble(
                Xtr, y, Xte, n_estimators=10, undersample_ratio=1.0,
                params=R(pipelines.V34A_PARAMS._replace(n_rounds=300)),
                verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "in_sample_f1": True}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config.startswith("v103"):
            # CV pseudo-labels, no test leakage: student regresses on
            # blend*hard + (1-blend)*teacher_OOF (reference:
            # train_v103_cv_pseudo.py:199-236 — the leak-free
            # distillation shape, T=1)
            blend = {"v103": 0.5, "v103a": 0.0, "v103b": 0.5,
                     "v103c": 0.8}[args.config]
            teacher = train_cv(Xtr, y, Xte, R(pipelines.V34A_PARAMS))
            cv = pipelines.run_distillation(
                Xtr, y, teacher.oof_preds, Xte,
                alpha=blend, temperature=1.0,
                params=R(pipelines.SOFT_LABEL_PARAMS), verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "blend": blend, "teacher_oof_f1": teacher.best_f1}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config == "v106":
            # MixUp augmentation (reference: train_v106_mixup.py, v106a
            # shape: alpha=0.2, 3 seeds x 5 folds)
            cv = pipelines.run_mixup(
                Xtr, y, Xte, alpha=0.2,
                params=R(pipelines.SOFT_LABEL_PARAMS), verbose=True)
            result = {"oof_f1": cv.best_f1, "threshold": cv.best_threshold,
                      "seed_f1s": cv.fold_f1s}
            test_preds, threshold = cv.test_preds, cv.best_threshold
        elif args.config in ("v10", "v13", "v22", "v27"):
            # DL baselines on raw sequences — documented failures kept as
            # capabilities (reference BENCHMARKS.md:32-60: LSTM/transformer
            # F1 0.10-0.12, ATAT 0.50; src/models/{lstm_classifier,
            # transformer_classifier,atat}.py; band-parallel attention-GRU,
            # scripts/train_v27_gru.py). Stratified 80/20 holdout,
            # focal loss, full-batch Adam; --rounds maps to epochs.
            import jax as _jax
            import jax.numpy as _jnp

            from mallorn_tpu.data.loader import load_all_data
            from mallorn_tpu.models import (ATAT, GRUClassifier,
                                            LSTMClassifier,
                                            TransformerClassifier,
                                            make_band_batch,
                                            make_sequence_batch)
            from mallorn_tpu.models.train_dl import train_model

            data = load_all_data(Path(args.data))
            make_batch = (make_band_batch if args.config == "v27"
                          else make_sequence_batch)
            batch = make_batch(data["train_packed"], data["train_meta"])
            rng = np.random.default_rng(42)
            pos = np.flatnonzero(np.asarray(batch.label) == 1)
            neg = np.flatnonzero(np.asarray(batch.label) == 0)
            rng.shuffle(pos), rng.shuffle(neg)
            val_ix = np.concatenate([pos[: max(len(pos) // 5, 1)],
                                     neg[: max(len(neg) // 5, 1)]])
            tr_ix = np.setdiff1d(np.arange(len(batch.label)), val_ix)

            def take(b, ix):
                return type(b)(*(None if v is None else v[ix] for v in b))

            # ATAT's tabular tower consumes the extracted feature matrix
            # (reference atat.py:113-157 quantile-tokenizes tabular
            # features); standardized, NaN -> 0
            tab = tab_te = None
            if args.config == "v22":
                Z = np.nan_to_num(np.asarray(Xtr, np.float64),
                                  nan=0.0, posinf=0.0, neginf=0.0)
                mu, sd = Z.mean(0), Z.std(0)
                sd = np.where(sd > 0, sd, 1.0)
                tab = _jnp.asarray((Z - mu) / sd, _jnp.float32)
            model = {"v10": LSTMClassifier, "v13": TransformerClassifier,
                     "v22": ATAT, "v27": GRUClassifier}[args.config]()
            n_epochs = args.rounds if args.rounds is not None else 100
            res = train_model(
                model, take(batch, tr_ix), val_batch=take(batch, val_ix),
                tabular=None if tab is None else tab[tr_ix],
                val_tabular=None if tab is None else tab[val_ix],
                n_epochs=n_epochs, lr=1e-3)
            result = {"val_f1": res.val_f1, "threshold": res.threshold,
                      "final_loss": float(res.losses[-1])}
            test_preds, threshold = None, res.threshold
            if object_ids_test is not None and "test_packed" in data:
                te_batch = make_batch(data["test_packed"],
                                      data["test_meta"])
                if args.config == "v22":
                    Zt = np.nan_to_num(np.asarray(Xte, np.float64),
                                       nan=0.0, posinf=0.0, neginf=0.0)
                    tab_te = _jnp.asarray((Zt - mu) / sd, _jnp.float32)
                    logits = model.apply(res.params, te_batch, tab_te,
                                         train=False)
                else:
                    logits = model.apply(res.params, te_batch, train=False)
                test_preds = np.asarray(_jax.nn.sigmoid(logits))
        else:
            raise SystemExit(f"unknown config {args.config}")

    (out_dir / f"result_{args.config}.json").write_text(
        json.dumps(result, default=float, indent=2))
    _log(json.dumps(result, default=float))

    if object_ids_test is not None and test_preds is not None:
        sub = write_submission(out_dir / f"submission_{args.config}.csv",
                               object_ids_test, (test_preds > threshold).astype(int))
        _log(f"submission: {sub}")


def cmd_predict(args):
    """Serve predictions from saved fold models on cached features."""
    from mallorn_tpu.data.loader import load_metadata
    from mallorn_tpu.io.model_store import load_cv_models
    from mallorn_tpu.io.submission import write_submission
    from mallorn_tpu.trees.gbdt import predict_proba_folds

    models, man = load_cv_models(args.model)
    fams = ["features_v4", "tde_physics", "multiband_gp", "bazin"]
    X_all, all_names = _load_matrices(args.cache, args.split, fams)
    name_to_idx = {n: i for i, n in enumerate(all_names)}
    missing = [n for n in man["feature_names"] if n not in name_to_idx]
    if missing:
        raise SystemExit(f"cached features missing columns: {missing[:5]}...")
    X = X_all[:, [name_to_idx[n] for n in man["feature_names"]]]
    X = np.nan_to_num(X, nan=np.nan, posinf=1e10, neginf=-1e10)

    # one vmapped forest scan over all folds (a per-model predict would
    # compile one executable per distinct best_iteration)
    probs = predict_proba_folds(models, X).mean(axis=0)
    log = load_metadata(Path(args.data), args.split)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / f"probs_{args.split}.npy", probs)
    sub = write_submission(out / f"submission_{args.split}.csv",
                           log["object_id"].to_numpy(),
                           (probs > man["threshold"]).astype(int))
    _log(f"wrote {sub} ({int((probs > man['threshold']).sum())} TDEs "
         f"@ threshold {man['threshold']:.3f})")


def main(argv=None):
    p = argparse.ArgumentParser(prog="mallorn",
                                description="TPU-native MALLORN pipeline")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="generate synthetic data")
    ps.add_argument("--out", required=True)
    ps.add_argument("--n-objects", type=int, default=300)
    ps.add_argument("--seed", type=int, default=0)
    ps.set_defaults(fn=cmd_synth)

    pe = sub.add_parser("extract", help="extract + cache features")
    pe.add_argument("--data", required=True)
    pe.add_argument("--cache", required=True)
    pe.add_argument("--families", default=None,
                    help=f"comma list of {','.join(FAMILIES)}")
    pe.add_argument("--gp-steps", type=int, default=200)
    pe.set_defaults(fn=cmd_extract)

    pt = sub.add_parser("train", help="train a pipeline config")
    pt.add_argument("--data", required=True)
    pt.add_argument("--cache", required=True)
    pt.add_argument("--config", default="v92d",
                    choices=["baseline", "v9", "v10", "v13", "v14", "v16", "v19", "v20",
                             "v22", "v26", "v27", "v30", "v34a",
                             "v35", "v40", "v42", "v45", "v47", "v48",
                             "v55", "v56", "v57", "v58", "v59b",
                             "v60", "v62", "v64", "v65", "v66",
                             "v92", "v92a", "v92b", "v92c", "v92d", "v93",
                             "v97", "v102", "v102a", "v102b", "v102c",
                             "v103", "v103a", "v103b", "v103c",
                             "v104", "v105", "v106", "v108",
                             "v110", "v111", "v114d", "v115c", "v118",
                             "v119", "kaggle"])
    pt.add_argument("--data-external", default=None,
                    help="external labeled dataset dir (v16)")
    pt.add_argument("--cache-external", default=None,
                    help="feature cache for the external dataset (v16)")
    pt.add_argument("--out", default="artifacts")
    pt.add_argument("--set", default=None, metavar="K=V[,K=V...]",
                    help="override GBDTParams fields on the chosen config "
                         "(e.g. reg_lambda=5.0,subsample=0.7) — the "
                         "reference's regularization-variant scripts "
                         "(v8/v28a/v29a/v81) as one flag")
    pt.add_argument("--rounds", type=int, default=None,
                    help="override n_rounds on every GBDT config "
                         "(tiny-scale smoke runs)")
    pt.add_argument("--mesh", type=int, default=None, metavar="N",
                    help="train every GBDT CV distributed over an "
                         "N-device mesh (row-sharded folds, psum'd "
                         "histograms; forests identical to single-device)")
    pt.set_defaults(fn=cmd_train)

    pp = sub.add_parser("predict", help="predict from saved fold models")
    pp.add_argument("--data", required=True)
    pp.add_argument("--cache", required=True)
    pp.add_argument("--model", required=True, help="saved models dir")
    pp.add_argument("--split", default="test")
    pp.add_argument("--out", default="artifacts")
    pp.set_defaults(fn=cmd_predict)

    args = p.parse_args(argv)
    if getattr(args, "mesh", None):
        # the default mesh is process-global: scope it to this invocation
        # (in-process callers — tests, notebooks — must not inherit it)
        from mallorn_tpu.parallel.mesh import set_default_mesh

        try:
            args.fn(args)
        finally:
            set_default_mesh(None)
    else:
        args.fn(args)


if __name__ == "__main__":
    main()
