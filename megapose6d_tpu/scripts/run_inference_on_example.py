"""Tutorial CLI: run the pose pipeline on an example directory.

Re-design of the reference's `scripts/run_inference_on_example.py` with the
same example-directory contract:

    <example_dir>/
      image_rgb.png            (+ image_depth.png, meters*1000 uint16)
      camera_data.json         ({"K": ..., "resolution": [h, w]})
      inputs/object_data.json  ([{"label", "bbox_modal"}, ...])
      meshes/<label>/<mesh files> or meshes/<label>.{ply,obj}
      outputs/object_data.json (written: [{"label", "TWO"}, ...])

Model weights come from training run dirs (``--coarse-run`` /
``--refiner-run``); ``--random-weights`` runs the pipeline with untrained
heads (pipeline smoke-test, no meaningful poses).

Usage:
    python -m megapose6d_tpu.scripts.run_inference_on_example <dir> \
        --run-inference [--coarse-run RUNDIR --refiner-run RUNDIR]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from ..data.types import (
    CameraData,
    ObjectData,
    ObservationTensor,
    object_data_from_json_path,
    object_data_to_json_path,
)
from ..inference.pose_estimator import PoseEstimator
from ..inference.types import InferenceConfig, make_detections
from ..meshes.mesh_db import MeshDataBase, RigidObject, RigidObjectDataset
from ..models.pose_predictor import (
    PosePredictor,
    PosePredictorConfig,
    make_coarse_config,
    make_refiner_config,
)
from ..utils.logging import get_logger

logger = get_logger(__name__)

MESH_SUFFIXES = (".ply", ".obj")


def make_object_dataset(example_dir: Path) -> RigidObjectDataset:
    """Scan `<dir>/meshes` (reference scans the same layout; meshes in mm)."""
    objects = []
    meshes_dir = example_dir / "meshes"
    for entry in sorted(meshes_dir.iterdir()):
        if entry.is_dir():
            for f in sorted(entry.iterdir()):
                if f.suffix.lower() in MESH_SUFFIXES:
                    objects.append(
                        RigidObject(
                            label=entry.name, mesh_path=f, mesh_units="mm"
                        )
                    )
                    break
        elif entry.suffix.lower() in MESH_SUFFIXES:
            objects.append(
                RigidObject(
                    label=entry.stem, mesh_path=entry, mesh_units="mm"
                )
            )
    assert objects, f"no meshes under {meshes_dir}"
    return RigidObjectDataset(objects)


def load_observation(example_dir: Path, load_depth: bool = False) -> ObservationTensor:
    from PIL import Image

    camera_data = CameraData.from_json(
        (example_dir / "camera_data.json").read_text()
    )
    rgb = np.asarray(Image.open(example_dir / "image_rgb.png"))[..., :3]
    depth = None
    if load_depth and (example_dir / "image_depth.png").exists():
        depth = (
            np.asarray(Image.open(example_dir / "image_depth.png")).astype(
                np.float32
            )
            / 1000.0
        )
    return ObservationTensor.from_numpy(rgb, depth, camera_data.K)


def load_detections(example_dir: Path):
    objs = object_data_from_json_path(example_dir / "inputs" / "object_data.json")
    labels = [o.label for o in objs]
    boxes = np.stack([o.bbox_modal for o in objs])
    return make_detections(labels, boxes)


def load_or_init_models(
    object_dataset: RigidObjectDataset,
    coarse_run: str | None,
    refiner_run: str | None,
    render_size=(240, 320),
    max_faces: int = 4096,
):
    mesh_db = MeshDataBase.from_object_ds(
        object_dataset, max_faces=max_faces
    ).batched()

    def build(run_dir, default_cfg_fn):
        if run_dir is not None:
            from ..training.config import load_config
            from ..training.train import create_train_state, load_checkpoint

            cfg = load_config(Path(run_dir) / "config.json")
            model = PosePredictor(
                PosePredictorConfig(**cfg.model_config_kwargs())
            )
            state = create_train_state(
                cfg, model, mesh_db, jax.random.PRNGKey(0)
            )
            state, _ = load_checkpoint(run_dir, state)
            return model, state.params
        model = PosePredictor(default_cfg_fn(render_size=render_size))
        dummy = (
            np.zeros((1, 48, 64, 3), np.float32),
            np.eye(3, dtype=np.float32)[None] * 100,
            np.eye(4, dtype=np.float32)[None],
        )
        params = model.init(
            jax.random.PRNGKey(0),
            *map(jax.numpy.asarray, dummy),
            mesh_db.select(jax.numpy.zeros((1,), jax.numpy.int32)),
        )
        return model, params

    coarse, cparams = build(coarse_run, make_coarse_config)
    refiner, rparams = build(refiner_run, make_refiner_config)
    return coarse, cparams, refiner, rparams, mesh_db


def vis_detections(args) -> None:
    """`--vis-detections`: overlay the input boxes on the RGB image
    (reference run_inference_on_example.py visualization step)."""
    from ..visualization.plotter import plot_detections

    example_dir = Path(args.example_dir)
    observation = load_observation(example_dir, load_depth=False)
    detections = load_detections(example_dir)
    out = example_dir / "visualizations" / "detections.png"
    out.parent.mkdir(exist_ok=True)
    plot_detections(
        np.asarray(observation.images[0]), detections, out_path=out
    )
    logger.info(f"wrote {out}")


def run_inference(args) -> None:
    example_dir = Path(args.example_dir)
    observation = load_observation(example_dir, load_depth=args.depth)
    detections = load_detections(example_dir)
    object_dataset = make_object_dataset(example_dir)

    coarse, cparams, refiner, rparams, mesh_db = load_or_init_models(
        object_dataset, args.coarse_run, args.refiner_run
    )
    cfg = InferenceConfig(
        SO3_grid_size=args.so3_grid_size,
        n_refiner_iterations=args.n_refiner_iterations,
        n_pose_hypotheses=args.n_pose_hypotheses,
        max_detections=max(1, len(detections)),
        bsz_images=args.bsz_images,
    )
    estimator = PoseEstimator(
        coarse, cparams, refiner, rparams, mesh_db, cfg
    )
    logger.info("running inference pipeline...")
    data, extra = estimator.run_inference_pipeline(observation, detections)
    logger.info(f"timing: {estimator.timing_}")

    out = [
        ObjectData(label=row.label, TWO=data.poses[i])
        for i, row in enumerate(data.infos.itertuples())
    ]
    out_path = example_dir / "outputs" / "object_data.json"
    out_path.parent.mkdir(exist_ok=True)
    object_data_to_json_path(out, out_path)
    logger.info(f"wrote {out_path}")

    if args.vis_outputs:
        # Interactive 3D viewer export (the reference's meshcat in-depth
        # analysis workflow, visualization/meshcat_visualizer.py:79-99).
        from ..visualization.scene_viewer import SceneViewer

        def mesh_for_label(label):
            i = int(mesh_db.label_to_index([label])[0])
            valid = np.asarray(mesh_db.face_valid[i])
            return (
                np.asarray(mesh_db.vertices[i]),
                np.asarray(mesh_db.faces[i])[valid],
                np.asarray(mesh_db.colors[i]),
            )

        viewer = SceneViewer(title=f"{example_dir.name} estimates")
        K = np.asarray(observation.K)[0]
        h, w = observation.images.shape[1:3]
        viewer.add_camera("camera", K, (h, w), TWC=np.eye(4))
        viewer.add_pose_estimates(data, mesh_for_label)
        html = viewer.write_html(example_dir / "outputs" / "scene.html")
        logger.info(f"wrote {html}")

        from ..visualization.plotter import plot_pose_overlay

        overlay_path = (
            example_dir / "visualizations" / "pose_overlay.png"
        )
        overlay_path.parent.mkdir(exist_ok=True)
        contour_path = (
            example_dir / "visualizations" / "contour_overlay.png"
        )
        plot_pose_overlay(
            np.asarray(observation.images[0]),
            mesh_db,
            list(data.infos["label"]),
            np.asarray(data.poses),
            K,
            out_path=overlay_path,
            contour_out_path=contour_path,
        )
        logger.info(f"wrote {overlay_path} and {contour_path}")


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("example_dir")
    parser.add_argument("--run-inference", action="store_true")
    parser.add_argument("--depth", action="store_true")
    parser.add_argument("--coarse-run", default=None)
    parser.add_argument("--refiner-run", default=None)
    parser.add_argument("--so3-grid-size", type=int, default=576)
    parser.add_argument("--n-refiner-iterations", type=int, default=5)
    parser.add_argument("--n-pose-hypotheses", type=int, default=5)
    parser.add_argument("--bsz-images", type=int, default=64)
    parser.add_argument(
        "--vis-outputs",
        action="store_true",
        help="write outputs/scene.html interactive 3D viewer + "
        "visualizations/pose_overlay.png",
    )
    parser.add_argument(
        "--vis-detections",
        action="store_true",
        help="write visualizations/detections.png (input boxes overlay, "
        "the reference tutorial's first step)",
    )
    args = parser.parse_args(argv)
    if args.vis_detections:
        vis_detections(args)
    if args.run_inference:
        run_inference(args)
    elif not args.vis_detections:
        parser.print_help()


if __name__ == "__main__":
    main()
