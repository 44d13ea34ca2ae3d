"""Finalize the long-refiner demo: load the trained refiner checkpoint,
train a coarse scorer, and evaluate the FULL coarse->top-K->refine->rescore
pipeline from GT boxes on held-out scenes.

Companion to demo_long_refiner (which produces the refiner checkpoint +
rotation learning curve); together they are the round-2 DEMO artifact.

Usage:
    python -m megapose6d_tpu.scripts.demo_finalize_pipeline \\
        refiner_dir=runs/refiner_long coarse_dir=runs/coarse_grid out_dir=runs/final_pipeline \\
        [coarse_steps=800] [epoch=] [so3=576]
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import jax
import numpy as np

from ..data import ObservationTensor
from ..inference import InferenceConfig, PoseEstimator, make_detections
from ..models.pose_predictor import PosePredictor, PosePredictorConfig
from ..ops.se3 import add_pose_noise
from ..training.config import TrainingConfig, make_coarse_cfg, make_refiner_cfg
from ..training.train import create_train_state, load_checkpoint, synthetic_batch_fn
from ..utils.logging import get_logger
from .demo_synthetic_e2e import build_world, pose_errors, train_model

logger = get_logger(__name__)


def main(argv=None):
    args = dict(
        refiner_dir="runs/refiner_long", out_dir="runs/final_pipeline",
        coarse_steps="800", epoch="", so3="576", n_eval="16",
        refine_iters="3", backbone="resnet18-spatial", render="240,320",
        batch_size="32", coarse_dir="", coarse_epoch="", lod_ab="0",
        prune_ab="0", prune_grid="72", prune_keep="8", top_k="4",
        dtype="auto", coarse_res_ab="0", coarse_render="120,160",
        coarse2_dir="", coarse2_epoch="", combo_ab="0",
        # combo_top_k: also shrink the refiner beam (n_pose_hypotheses)
        # in the combined-config A/B — the refiner phase scales linearly
        # with the beam, so top-2 halves it vs the default top-4.
        combo_top_k="",
    )
    for a in sys.argv[1:] if argv is None else argv:
        k, _, v = a.partition("=")
        assert k in args, f"unknown arg {k}"
        args[k] = v

    out_dir = Path(args["out_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    input_res = tuple(int(x) for x in args["render"].split(","))
    if args["dtype"] == "auto":
        dtype = (
            "bfloat16" if jax.devices()[0].platform != "cpu" else "float32"
        )
    else:
        # bf16 coarse scoring measurably degrades SO(3)-grid ranking
        # (see runs/coarse_grid history vs the f32 re-eval); eval demos
        # default to platform dtype but accept an override.
        dtype = args["dtype"]
    mesh_db = build_world()

    base = TrainingConfig(
        input_resize=input_res, render_size=input_res,
        batch_size=int(args["batch_size"]), backbone_str=args["backbone"],
        compute_dtype=dtype, n_points_loss=256, lr=3e-4, n_epochs_warmup=200,
        lr_epoch_decay=10**6, epoch_size=int(args["batch_size"]), seed=0,
    )
    # Refiner: same config as demo_long_refiner, weights from its checkpoint.
    ref_cfg = dataclasses.replace(
        make_refiner_cfg(base), n_rendered_views=2,
        multiview_type="front_1view", n_iterations=1,
    )
    refiner = PosePredictor(PosePredictorConfig(**ref_cfg.model_config_kwargs()))
    ref_state = create_train_state(
        ref_cfg, refiner, mesh_db, jax.random.PRNGKey(0), input_res=input_res
    )
    epoch = int(args["epoch"]) if args["epoch"] else None
    ref_state, loaded_epoch = load_checkpoint(
        args["refiner_dir"], ref_state, epoch=epoch, params_only=True
    )
    logger.info(f"loaded refiner checkpoint @ step {loaded_epoch}")

    # Coarse scorer: load the long-schedule checkpoint when provided
    # (demo_long_coarse), else short in-place training.
    coarse_cfg = dataclasses.replace(make_coarse_cfg(base), n_hypotheses=4)
    if args["coarse_dir"]:
        coarse = PosePredictor(
            PosePredictorConfig(**coarse_cfg.model_config_kwargs())
        )
        coarse_state = create_train_state(
            coarse_cfg, coarse, mesh_db, jax.random.PRNGKey(1),
            input_res=input_res,
        )
        c_epoch = int(args["coarse_epoch"]) if args["coarse_epoch"] else None
        coarse_state, c_step = load_checkpoint(
            args["coarse_dir"], coarse_state, epoch=c_epoch, params_only=True
        )
        logger.info(f"loaded coarse checkpoint @ step {c_step}")
    else:
        coarse, coarse_state, _ = train_model(
            coarse_cfg, mesh_db, int(args["coarse_steps"]), input_res,
            "coarse",
        )

    # ------------------------------------------------------------------
    n_eval = int(args["n_eval"])
    eval_batch = jax.jit(
        synthetic_batch_fn(mesh_db, max(n_eval, 16), input_res, f=400.0)
    )(jax.random.PRNGKey(9999))
    meshes = mesh_db.select(eval_batch.mesh_idx)
    pts = meshes.points[:, :256]
    n_it = int(args["refine_iters"])

    # (a/b) refiner-only from noised GT.
    TCO_init = add_pose_noise(
        jax.random.PRNGKey(7), eval_batch.TCO,
        euler_deg_std=(15, 15, 15), trans_std=(0.01, 0.01, 0.05),
    )

    @jax.jit
    def refine_n(params, TCO):
        def body(T, _):
            out = refiner.apply(
                params, eval_batch.rgbs, eval_batch.K, T, meshes,
                method=PosePredictor.refine_step,
            )
            return out["TCO_output"], None

        return jax.lax.scan(body, TCO, None, length=n_it)[0]

    TCO_ref = refine_n(ref_state.params, TCO_init)
    add0, rot0, tr0 = pose_errors(TCO_init, eval_batch.TCO, pts)
    add1, rot1, tr1 = pose_errors(TCO_ref, eval_batch.TCO, pts)

    # (c) full pipeline from GT boxes.
    icfg = InferenceConfig(
        SO3_grid_size=int(args["so3"]),
        n_refiner_iterations=n_it,
        n_pose_hypotheses=int(args["top_k"]),
        bsz_images=64,
        bsz_objects=16,
        max_detections=1,
    )
    est = PoseEstimator(
        coarse, coarse_state.params, refiner, ref_state.params, mesh_db,
        icfg,
    )
    labels = list(mesh_db.labels)

    def run_pipeline_eval(estimator, tag):
        add_l, rot_l, tr_l, poses_l = [], [], [], []
        for i in range(n_eval):
            obs = ObservationTensor(
                images=np.asarray(eval_batch.rgbs[i : i + 1]),
                K=np.asarray(eval_batch.K[i : i + 1]),
            )
            det = make_detections(
                [labels[int(eval_batch.mesh_idx[i])]],
                np.asarray(eval_batch.bboxes[i : i + 1]),
            )
            data, _ = estimator.run_inference_pipeline(obs, det)
            a, r, t = pose_errors(
                data.poses, np.asarray(eval_batch.TCO[i : i + 1]),
                pts[i : i + 1],
            )
            add_l.append(float(a[0]))
            rot_l.append(float(r[0]))
            tr_l.append(float(t[0]))
            poses_l.append(np.asarray(data.poses[0]))
            logger.info(
                f"pipeline[{tag}] {i + 1}/{n_eval}: ADD {a[0] * 1000:.1f} "
                f"mm, rot {r[0]:.1f} deg, trans {t[0] * 1000:.1f} mm"
            )
        return add_l, rot_l, tr_l, poses_l

    pipe_add, pipe_rot, pipe_tr, pipe_poses = run_pipeline_eval(est, "full")

    def ab_report(est2, tag, **extra):
        """Run the pipeline with an alternative estimator config and
        report top-1 agreement + error deltas vs the full run."""
        a_add, a_rot, _a_tr, a_poses = run_pipeline_eval(est2, tag)
        same = [
            float(np.allclose(a, b, atol=1e-5))
            for a, b in zip(pipe_poses, a_poses)
        ]
        rep = {
            "top1_pose_agreement_frac": float(np.mean(same)),
            "add_mm_full": float(np.median(pipe_add) * 1000),
            f"add_mm_{tag}": float(np.median(a_add) * 1000),
            "rot_deg_full": float(np.median(pipe_rot)),
            f"rot_deg_{tag}": float(np.median(a_rot)),
            # Per-frame tail: medians can hide a single catastrophic
            # regression (the rejected 144/16 prune A/B had a 86 mm
            # worst-frame ADD miss behind a 0.05 mm median delta).
            "add_mm_worst_frame_delta": float(
                np.max(np.asarray(a_add) - np.asarray(pipe_add)) * 1000
            ),
            **extra,
        }
        logger.info(f"{tag} A/B: {json.dumps(rep)}")
        return rep

    lod_report = None
    if args["lod_ab"] == "1":
        # A/B: rescoring + grid scoring on DECIMATED meshes (the
        # mesh_db_coarse production config) vs full-LOD — measures
        # whether low-LOD silhouettes preserve the top-1 selection
        # (VERDICT r2 weak #3; reference rescores with full meshes,
        # pose_estimator.py:602-613).
        mesh_db_lod = build_world(max_faces=512)
        lod_report = ab_report(
            PoseEstimator(
                coarse, coarse_state.params, refiner, ref_state.params,
                mesh_db, icfg, mesh_db_coarse=mesh_db_lod,
            ),
            "lod",
            coarse_lod_faces=int(mesh_db_lod.faces.shape[1]),
        )

    coarse_res_report = None
    if args["coarse_res_ab"] == "1":
        # A/B: coarse SO(3)-sweep renders rasterized at a reduced
        # resolution and upsampled before the CNN (same checkpoint —
        # InferenceConfig.coarse_render_size) vs full-resolution renders.
        # This is the ~70%-of-pipeline render-cost lever (STATUS.md perf
        # decomposition); bench.py promotes the low-res headline only
        # when this committed A/B validates it. Reference coarse scoring
        # semantics: models/pose_rigid.py:634-708 (always 240x320).
        c_res = tuple(int(x) for x in args["coarse_render"].split(","))
        coarse_res_report = ab_report(
            PoseEstimator(
                coarse, coarse_state.params, refiner, ref_state.params,
                mesh_db,
                dataclasses.replace(icfg, coarse_render_size=c_res),
            ),
            "coarse_res",
            coarse_render_size=list(c_res),
        )

    coarse_small_report = None
    coarse2 = c2_state = None
    if args["coarse2_dir"]:
        # A/B: a SECOND coarse checkpoint trained at a smaller native
        # input/render resolution (demo_long_coarse render=120,160)
        # scoring the same SO(3) sweep — unlike coarse_render_size (which
        # only lowers the raster and upsamples for the same CNN), this
        # shrinks the CNN itself ~4x, the dominant FLOPs component of the
        # pipeline (bench flops_split: ~93% coarse scoring). The model's
        # own crop path (PosePredictor.crop_inputs) resizes observations
        # to its render_size, so the estimator composes the two models
        # directly. Reference always scores at 240x320
        # (models/pose_rigid.py:634-708).
        from ..training.config import load_config

        cfg2 = load_config(Path(args["coarse2_dir"]) / "config.json")
        cfg2 = dataclasses.replace(cfg2, compute_dtype=dtype)
        coarse2 = PosePredictor(
            PosePredictorConfig(**cfg2.model_config_kwargs())
        )
        c2_state = create_train_state(
            cfg2, coarse2, mesh_db, jax.random.PRNGKey(2),
            input_res=tuple(cfg2.input_resize),
        )
        c2_epoch = (
            int(args["coarse2_epoch"]) if args["coarse2_epoch"] else None
        )
        c2_state, c2_step = load_checkpoint(
            args["coarse2_dir"], c2_state, epoch=c2_epoch, params_only=True
        )
        logger.info(f"loaded small coarse checkpoint @ step {c2_step}")
        coarse_small_report = ab_report(
            PoseEstimator(
                coarse2, c2_state.params, refiner, ref_state.params,
                mesh_db, icfg,
            ),
            "coarse_small",
            coarse_input_size=list(cfg2.render_size),
            coarse2_dir=args["coarse2_dir"],
            coarse2_step=int(c2_step),
        )

    prune_report = None
    if args["prune_ab"] == "1":
        # A/B: hierarchical coarse scoring (probe grid + top-K parents'
        # Voronoi children) vs the full sweep — the accuracy check gating
        # the bench's pruned row. 72/8 was REJECTED by the round-4 A/B
        # (top-1 agreement 0.5); prune_grid=/prune_keep= sweep gentler
        # settings (e.g. 144/16) without editing the script.
        prune_report = ab_report(
            PoseEstimator(
                coarse, coarse_state.params, refiner, ref_state.params,
                mesh_db,
                dataclasses.replace(
                    icfg,
                    SO3_prune_grid_size=int(args["prune_grid"]),
                    SO3_prune_keep=int(args["prune_keep"]),
                ),
            ),
            "pruned",
            prune_grid=int(args["prune_grid"]),
            prune_keep=int(args["prune_keep"]),
        )

    combo_report = None
    if args["combo_ab"] == "1":
        # A/B of the exact COMBINED fast configuration the bench promotes
        # (independent per-lever gates assume the levers compose; this is
        # the direct check): small-native coarse scorer when coarse2_dir
        # is given (else the full-res one + coarse_render_size), plus
        # hierarchical pruning at prune_grid/prune_keep.
        combo_cfg = dataclasses.replace(
            icfg,
            SO3_prune_grid_size=int(args["prune_grid"]),
            SO3_prune_keep=int(args["prune_keep"]),
            coarse_render_size=(
                None if coarse2 is not None
                else tuple(int(x) for x in args["coarse_render"].split(","))
            ),
        )
        if args["combo_top_k"]:
            combo_cfg = dataclasses.replace(
                combo_cfg, n_pose_hypotheses=int(args["combo_top_k"])
            )
        c_model = coarse2 if coarse2 is not None else coarse
        c_params = (
            c2_state.params if c2_state is not None else coarse_state.params
        )
        combo_report = ab_report(
            PoseEstimator(
                c_model, c_params, refiner, ref_state.params, mesh_db,
                combo_cfg,
            ),
            "combo",
            prune_grid=int(args["prune_grid"]),
            prune_keep=int(args["prune_keep"]),
            coarse_small=bool(coarse2 is not None),
            **(
                {"top_k": int(args["combo_top_k"])}
                if args["combo_top_k"] else {}
            ),
            coarse_render_size=(
                None if coarse2 is not None
                else [int(x) for x in args["coarse_render"].split(",")]
            ),
        )

    diam = float(np.asarray(mesh_db.diameters).mean())
    report = {
        "refiner_checkpoint_step": loaded_epoch,
        "refine_iters": n_it,
        "init": {
            "add_mm": float(np.median(add0) * 1000),
            "rot_deg": float(np.median(rot0)),
            "trans_mm": float(np.median(tr0) * 1000),
        },
        "refined": {
            "add_mm": float(np.median(add1) * 1000),
            "rot_deg": float(np.median(rot1)),
            "trans_mm": float(np.median(tr1) * 1000),
            "rot_improved_frac": float((rot1 < rot0).mean()),
            "add_improved_frac": float((add1 < add0).mean()),
        },
        "pipeline": {
            "add_mm": float(np.median(pipe_add) * 1000),
            "rot_deg": float(np.median(pipe_rot)),
            "trans_mm": float(np.median(pipe_tr) * 1000),
            "add_below_0.1d_frac": float(
                (np.asarray(pipe_add) < 0.1 * diam).mean()
            ),
        },
        "mean_diameter_m": diam,
        "so3_grid": int(args["so3"]),
        "coarse_dir": args["coarse_dir"] or None,
        "lod_ab": lod_report,
        "prune_ab": prune_report,
        "coarse_res_ab": coarse_res_report,
        "coarse_small_ab": coarse_small_report,
        "combo_ab": combo_report,
    }
    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    logger.info(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
