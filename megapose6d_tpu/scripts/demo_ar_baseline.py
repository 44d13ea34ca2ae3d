"""Synthetic BOP19 AR baseline with the round-3 trained demo models.

Generates a BOP-layout dataset from the demo world (same textured
primitives + render statistics the demo checkpoints were trained on),
runs the full pipeline (GT detections -> 576-grid coarse -> top-K ->
refine -> rescore) through PredictionRunner, and scores BOP19 AR
(VSD / MSSD / MSPD, in-tree `evaluation/vsd.py` + `BOPScoreMeter`) —
the self-consistent AR datapoint VERDICT r2 asked for (missing #2 /
next #7). Reference semantics: `evaluation/bop.py:100-218` +
`scripts/run_full_megapose_eval.py` result keys.

Usage:
    python -m megapose6d_tpu.scripts.demo_ar_baseline \\
        refiner_dir=runs/refiner_long coarse_dir=runs/coarse_grid \\
        out_dir=runs/ar_baseline [n_frames=24] [so3=576] [refine_iters=3]
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import jax
import numpy as np

from ..data.bop_scene_dataset import BOPDataset
from ..evaluation.meters import BOPScoreMeter
from ..evaluation.runner import EvaluationRunner, PredictionRunner
from ..inference import InferenceConfig, PoseEstimator
from ..models.pose_predictor import PosePredictor, PosePredictorConfig
from ..training.config import TrainingConfig, make_coarse_cfg, make_refiner_cfg
from ..training.train import create_train_state, load_checkpoint
from ..utils.logging import get_logger
from .generate_synthetic_dataset import generate_bop

logger = get_logger(__name__)


def build_bop_world(world: str = "demo"):
    """The eval world under BOP-convention labels, so the generated
    dataset and CSV keep obj_id semantics.

    world="demo": the textured cube+sphere the demo checkpoints were
    TRAINED on (demo_synthetic_e2e.build_world).
    world="novel": textured cylinder+cone — shapes AND textures the
    checkpoints have NEVER seen. Render-and-compare conditions on the
    mesh only through its renders, so trained weights apply to new
    meshes with no retraining — the reference's headline novel-object
    capability (its NAMED_MODELS are advertised as working on unseen
    meshes; inference loads an arbitrary mesh database at run time,
    reference inference/pose_estimator.py:98-135)."""
    if world == "novel":
        from ..data.object_datasets import RigidObject, RigidObjectDataset
        from ..meshes.io import make_cone, make_cylinder
        from ..meshes.mesh_db import MeshDataBase

        objs = RigidObjectDataset(
            [
                RigidObject(
                    label="obj_000001",
                    mesh=make_cylinder(
                        0.022, 0.09, n_seg=32, textured=True, seed=7
                    ),
                ),
                RigidObject(
                    label="obj_000002",
                    mesh=make_cone(
                        0.035, 0.08, n_seg=32, textured=True, seed=8
                    ),
                ),
            ]
        )
        db = MeshDataBase.from_object_ds(
            objs, max_faces=2048, n_points=512, n_sym=4
        ).batched()
        return db, objs
    assert world == "demo", world
    from .demo_synthetic_e2e import build_world

    return build_world(
        return_objects=True, labels=("obj_000001", "obj_000002")
    )


def main(argv=None):
    args = dict(
        refiner_dir="runs/refiner_long", coarse_dir="runs/coarse_grid",
        out_dir="ar_baseline", n_frames="24", so3="576", refine_iters="3",
        backbone="resnet18-spatial", render="240,320", n_hyp="4",
        detector_dir="", depth_refine="0", dtype="auto",
        # Optional suffix for the report filename, so multiple
        # configurations (e.g. icp-vs-gnc depth refiners) of the same
        # domain can share an out_dir/dataset without clobbering.
        tag="",
        # Observation domain of the generated dataset: "realism"
        # (backgrounds + point light + shadows + IBL) or "unlit"
        # (flat-albedo black-background, matching synthetic_batch_fn
        # training observations — see NEXT.md: models trained on the
        # demo batches collapse on realism observations).
        domain="realism",
        # world=demo: the training objects (cube+sphere).
        # world=novel: textured cylinder+cone NEVER seen in training —
        # the novel-object transfer row (see build_bop_world).
        world="demo",
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

    mesh_db, objects = build_bop_world(args["world"])

    # BOP-layout dataset at the training camera statistics (f=400,
    # 240x320 — synthetic_batch_fn's defaults in the demo runs).
    domain = args["domain"]
    assert domain in ("realism", "unlit"), domain
    ds_dir = out_dir / (
        ("synthdemo" if domain == "realism" else "synthdemo_unlit")
        + ("" if args["world"] == "demo" else f"_{args['world']}")
    )
    if not (ds_dir / "test").exists():
        generate_bop(
            mesh_db, objects, ds_dir,
            n_frames=int(args["n_frames"]), resolution=input_res,
            n_obj_per_scene=2, f=400.0, frames_per_scene=4, seed=123,
            background=(domain == "realism"), unlit=(domain == "unlit"),
        )
    # load_depth: enables the in-tree VSD term (BOPScoreMeter computes
    # e_VSD only when the frame carries a depth image).
    scene_ds = BOPDataset(ds_dir, split="test", load_depth=True)
    logger.info(f"dataset: {len(scene_ds)} frames at {input_res}")

    base = TrainingConfig(
        input_resize=input_res, render_size=input_res, batch_size=32,
        backbone_str=args["backbone"], compute_dtype=dtype,
        n_points_loss=256, lr=3e-4, n_epochs_warmup=200,
        lr_epoch_decay=10**6, epoch_size=32, seed=0,
    )
    ref_cfg = dataclasses.replace(
        make_refiner_cfg(base), n_rendered_views=2,
        multiview_type="front_1view", n_iterations=1,
    )
    refiner = PosePredictor(
        PosePredictorConfig(**ref_cfg.model_config_kwargs())
    )
    ref_state = create_train_state(
        ref_cfg, refiner, mesh_db, jax.random.PRNGKey(0),
        input_res=input_res,
    )
    r_step = 0
    if args["refiner_dir"]:
        ref_state, r_step = load_checkpoint(
            args["refiner_dir"], ref_state, params_only=True
        )
    coarse_cfg = dataclasses.replace(make_coarse_cfg(base), n_hypotheses=4)
    coarse = PosePredictor(
        PosePredictorConfig(**coarse_cfg.model_config_kwargs())
    )
    coarse_state = create_train_state(
        coarse_cfg, coarse, mesh_db, jax.random.PRNGKey(1),
        input_res=input_res,
    )
    c_step = 0
    if args["coarse_dir"]:
        coarse_state, c_step = load_checkpoint(
            args["coarse_dir"], coarse_state, params_only=True
        )
    logger.info(f"checkpoints: refiner@{r_step} coarse@{c_step}")

    estimator = PoseEstimator(
        coarse, coarse_state.params, refiner, ref_state.params, mesh_db,
        InferenceConfig(
            SO3_grid_size=int(args["so3"]),
            n_refiner_iterations=int(args["refine_iters"]),
            n_pose_hypotheses=int(args["n_hyp"]),
            bsz_images=64, bsz_objects=16, max_detections=2,
        ),
    )
    runner = PredictionRunner(scene_ds, estimator, detection_type="gt")
    preds = runner.get_predictions()
    final = preds["final"]
    logger.info(f"{len(final)} predictions")

    h, w = scene_ds[0].rgb.shape[:2]
    summary = EvaluationRunner(
        scene_ds, {"bop": BOPScoreMeter(mesh_db, image_width=w)}
    ).evaluate(final)

    depth_summary = None
    if args["depth_refine"] in ("1", "icp", "gnc"):
        # Depth refinement on top of the RGB pipeline (reference
        # NAMED_MODELS '-icp' variants, pose_estimator.py:616-621).
        # depth_refine=gnc swaps in the GNC-TLS global-registration
        # refiner (the reference's TeaserppRefiner analog,
        # inference/teaserpp_refiner.py:53-289).
        import dataclasses as _dc

        from ..inference.depth_refiner import (
            GNCRegistrationRefiner,
            ICPRefiner,
        )

        refiner_cls = (
            GNCRegistrationRefiner
            if args["depth_refine"] == "gnc" else ICPRefiner
        )
        est_icp = PoseEstimator(
            coarse, coarse_state.params, refiner, ref_state.params,
            mesh_db,
            _dc.replace(estimator.cfg, run_depth_refiner=True),
            depth_refiner=refiner_cls(mesh_db),
        )
        icp_runner = PredictionRunner(
            scene_ds, est_icp, detection_type="gt"
        )
        icp_final = icp_runner.get_predictions()["final"]
        depth_summary = EvaluationRunner(
            scene_ds, {"bop": BOPScoreMeter(mesh_db, image_width=w)}
        ).evaluate(icp_final)
        logger.info(f"depth-refined summary: {depth_summary}")

    det_summary = None
    if args["detector_dir"]:
        # Pipeline from DETECTOR boxes (reference detection_type=
        # 'detector', prediction_runner.py:96-107) — the end-to-end row
        # with no GT at inference time.
        from ..evaluation.evaluation import load_detector

        detector = load_detector(args["detector_dir"])
        det_runner = PredictionRunner(
            scene_ds, estimator, detector=detector,
            detection_type="detector",
        )
        det_final = det_runner.get_predictions()["final"]
        logger.info(f"{len(det_final)} detector-driven predictions")
        if len(det_final):
            det_summary = EvaluationRunner(
                scene_ds, {"bop": BOPScoreMeter(mesh_db, image_width=w)}
            ).evaluate(det_final)
    report = {
        "dataset": str(ds_dir),
        "domain": domain,
        "world": args["world"],
        "n_frames": len(scene_ds),
        "refiner_step": int(r_step),
        "coarse_step": int(c_step),
        "so3_grid": int(args["so3"]),
        "refine_iters": int(args["refine_iters"]),
        "summary": {
            k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
            for k, v in summary.get("bop", summary).items()
        } if isinstance(summary, dict) else summary,
        "detector_dir": args["detector_dir"] or None,
        "summary_from_detector": (
            det_summary.get("bop", det_summary)
            if isinstance(det_summary, dict) else det_summary
        ),
        "depth_refine_method": (
            {"1": "icp", "icp": "icp", "gnc": "gnc"}.get(
                args["depth_refine"])
        ),
        "summary_depth_refined": (
            depth_summary.get("bop", depth_summary)
            if isinstance(depth_summary, dict) else depth_summary
        ),
    }
    report_name = (
        "report.json" if domain == "realism" else f"report_{domain}.json"
    )
    if args["world"] != "demo":
        report_name = report_name[:-5] + f"_{args['world']}.json"
    if args["tag"]:
        report_name = report_name[:-5] + f"_{args['tag']}.json"
    (out_dir / report_name).write_text(
        json.dumps(report, indent=2, default=str)
    )
    logger.info(json.dumps(report, indent=2, default=str))
    return report


if __name__ == "__main__":
    main()
