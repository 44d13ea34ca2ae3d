"""Evaluation CLI: run the pipeline over a BOP scene dataset, write the
BOP19 results CSV and (ModelNet-style) meter summaries.

Re-design of the reference's `run_full_megapose_eval.py` /
`evaluation/evaluation.py:71-231` driver for one dataset:

    python -m megapose6d_tpu.scripts.run_eval dataset=ycbv.bop19 \\
        coarse_run=runs/coarse refiner_run=runs/refiner \\
        out_dir=eval_out n_frames=50
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
from ..evaluation.bop import convert_results_to_bop
from ..evaluation.meters import BOPScoreMeter, ModelNetErrorMeter
from ..evaluation.runner import EvaluationRunner, PredictionRunner
from ..inference.pose_estimator import PoseEstimator
from ..inference.types import InferenceConfig
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main(argv=None):
    args = dict(
        dataset="ycbv.bop19",
        coarse_run="",
        refiner_run="",
        out_dir="eval_out",
        n_frames="0",
        rank="0",
        world_size="1",
        so3_grid_size="576",
        n_refiner_iterations="5",
        n_pose_hypotheses="5",
        max_detections="8",
        load_depth="0",
        render_size="240,320",
        max_faces="4096",
    )
    for a in sys.argv[1:] if argv is None else argv:
        k, _, v = a.partition("=")
        assert k in args, f"unknown arg {k}"
        args[k] = v

    scene_ds = make_scene_dataset(
        args["dataset"], load_depth=args["load_depth"] == "1"
    )
    object_ds = make_object_dataset(args["dataset"])

    from .run_inference_on_example import load_or_init_models

    coarse, cparams, refiner, rparams, mesh_db = load_or_init_models(
        object_ds,
        args["coarse_run"] or None,
        args["refiner_run"] or None,
        render_size=tuple(int(x) for x in args["render_size"].split(",")),
        max_faces=int(args["max_faces"]),
    )
    cfg = InferenceConfig(
        SO3_grid_size=int(args["so3_grid_size"]),
        n_refiner_iterations=int(args["n_refiner_iterations"]),
        n_pose_hypotheses=int(args["n_pose_hypotheses"]),
        max_detections=int(args["max_detections"]),
    )
    estimator = PoseEstimator(coarse, cparams, refiner, rparams, mesh_db, cfg)

    runner = PredictionRunner(
        scene_ds,
        estimator,
        rank=int(args["rank"]),
        world_size=int(args["world_size"]),
        n_frames=int(args["n_frames"]) or None,
    )
    logger.info(f"predicting {len(runner.frame_ids)} frames...")
    preds = runner.get_predictions()["final"]

    out_dir = Path(args["out_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    csv = convert_results_to_bop(
        preds, out_dir / f"{args['dataset'].split('.')[0]}.csv"
    )
    logger.info(f"wrote {csv} ({len(preds)} predictions)")

    h, w = scene_ds[0].rgb.shape[:2] if len(scene_ds) else (480, 640)
    meters = {
        "modelnet": ModelNetErrorMeter(mesh_db),
        "bop": BOPScoreMeter(mesh_db, image_width=w),
    }
    summary = EvaluationRunner(scene_ds, meters).evaluate(preds)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    logger.info(f"summary: {summary}")
    return summary


if __name__ == "__main__":
    main()
