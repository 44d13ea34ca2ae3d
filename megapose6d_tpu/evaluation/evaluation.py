"""Structured-config evaluation driver.

Re-design of the reference's `evaluation/evaluation.py:71-231` (`run_eval`)
for the TPU stack: one `EvalConfig` in, predictions + meters + BOP CSV out,
written under `get_save_dir(cfg)` = `<save_dir>/<ds_name>/<detection>+
<coarse>` exactly as the reference lays out its sweep results
(`evaluation/evaluation.py:52-68`). Stage-keyed predictions (`final`,
`refiner/iteration=N`, `coarse`) are persisted as an npz + json bundle
instead of `results.pth.tar`.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
from ..data.tensor_collection import PandasTensorCollection
from ..utils.logging import get_logger
from .bop import convert_results_to_bop
from .eval_config import EvalConfig, get_save_dir
from .meters import BOPScoreMeter, ModelNetErrorMeter
from .runner import EvaluationRunner, PredictionRunner

logger = get_logger(__name__)


def load_detector(run_dir: str | Path, detection_th: float = 0.7):
    """Rebuild a trained CenterNet detector from its run dir
    (analog of the reference's `load_detector`, inference/utils.py:56-77:
    checkpoint + config.yaml -> Detector wrapper)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..models.detector import CenterNetDetector, Detector, DetectorConfig

    run_dir = Path(run_dir)
    labels = json.loads((run_dir / "labels.json").read_text())
    cfg_path = run_dir / "config.json"
    if cfg_path.exists():
        cfg = DetectorConfig(**json.loads(cfg_path.read_text()))
    else:  # pre-round-3 run dirs: defaults with the right class count
        cfg = DetectorConfig(n_classes=len(labels))
    model = CenterNetDetector(cfg)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    ckptr = ocp.StandardCheckpointer()
    # Target-sharding abstract tree: lets a TPU-saved detector checkpoint
    # restore in a CPU process (see training/train.py:load_checkpoint).
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        {"params": template},
    )
    restored = ckptr.restore(
        (run_dir / "checkpoints" / "final").absolute(), abstract
    )
    return Detector(
        model, restored["params"], labels, detection_th=detection_th
    )


def save_predictions(
    preds: dict[str, PandasTensorCollection], path: Path
) -> Path:
    """Persist stage-keyed prediction collections (the reference's
    `results.pth.tar` = {'predictions': {key: PandasTensorCollection}},
    evaluation/evaluation.py:208-222) as `<path>.npz` + `<path>.json`."""
    arrays: dict[str, np.ndarray] = {}
    infos: dict[str, str] = {}
    for key, tc in preds.items():
        safe = key.replace("/", "__")
        infos[safe] = tc.infos.to_json(orient="split")
        for name, arr in tc.tensors.items():
            arrays[f"{safe}::{name}"] = np.asarray(arr)
    np.savez_compressed(str(path) + ".npz", **arrays)
    Path(str(path) + ".json").write_text(json.dumps(infos))
    return Path(str(path) + ".npz")


def load_predictions(path: Path) -> dict[str, PandasTensorCollection]:
    import io

    import pandas as pd

    path = str(path)
    if path.endswith(".npz"):
        path = path[: -len(".npz")]
    infos = json.loads(Path(path + ".json").read_text())
    arrays = np.load(path + ".npz")
    out: dict[str, PandasTensorCollection] = {}
    for safe, infos_json in infos.items():
        tensors = {
            name.split("::", 1)[1]: arrays[name]
            for name in arrays.files
            if name.startswith(safe + "::")
        }
        out[safe.replace("__", "/")] = PandasTensorCollection(
            pd.read_json(io.StringIO(infos_json), orient="split"), **tensors
        )
    return out


def run_eval(
    cfg: EvalConfig,
    scene_ds=None,
    object_ds=None,
) -> Optional[dict]:
    """One (dataset, detection-type, coarse-type) evaluation
    (reference run_eval, evaluation/evaluation.py:71-231).

    Returns {'results_path', 'pred_keys', 'save_dir', 'summary'} on the
    calling rank (the reference returns save_dir info on rank 0 only; here
    every rank evaluates its own frame shard and rank 0 carries the merged
    summary when the caller gathers).
    """
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    save_dir = get_save_dir(cfg)
    save_dir.mkdir(parents=True, exist_ok=True)

    if scene_ds is None:
        scene_ds = make_scene_dataset(cfg.ds_name, load_depth=cfg.load_depth)
    if object_ds is None:
        object_ds = make_object_dataset(cfg.ds_name)

    def score_and_save(final, mesh_db) -> dict:
        """Meter the 'final' predictions and persist summary.json."""
        summary: dict = {}
        if not cfg.skip_evaluation and len(final):
            h, w = (
                scene_ds[0].rgb.shape[:2] if len(scene_ds) else (480, 640)
            )
            meters = {
                "modelnet": ModelNetErrorMeter(mesh_db),
                "bop": BOPScoreMeter(mesh_db, image_width=w),
            }
            summary = EvaluationRunner(scene_ds, meters).evaluate(final)
            (save_dir / "summary.json").write_text(
                json.dumps(summary, indent=2, default=str)
            )
        return summary

    if cfg.skip_inference:
        # Re-score existing results without re-running the pipeline
        # (reference EvalConfig.skip_inference, eval_config.py:71).
        results_path = save_dir / "results.npz"
        assert results_path.exists(), (
            f"skip_inference=True but no saved predictions at {results_path}"
        )
        preds = load_predictions(results_path)
        from ..scripts.run_inference_on_example import load_or_init_models

        *_, mesh_db = load_or_init_models(
            object_ds, None, None,
            render_size=tuple(cfg.render_size),
            max_faces=cfg.max_faces,
        )
        return {
            "results_path": results_path,
            "pred_keys": list(preds.keys()),
            "save_dir": save_dir,
            "summary": score_and_save(preds["final"], mesh_db),
        }

    from ..inference.pose_estimator import PoseEstimator
    from ..scripts.run_inference_on_example import load_or_init_models

    coarse, cparams, refiner, rparams, mesh_db = load_or_init_models(
        object_ds,
        cfg.coarse_run or None,
        cfg.refiner_run or None,
        render_size=tuple(cfg.render_size),
        max_faces=cfg.max_faces,
    )
    estimator = PoseEstimator(
        coarse, cparams, refiner, rparams, mesh_db, cfg.inference
    )

    detector = None
    if cfg.inference.detection_type == "detector":
        assert cfg.detector_run, (
            "detection_type='detector' requires detector_run"
        )
        detector = load_detector(cfg.detector_run)

    runner = PredictionRunner(
        scene_ds,
        estimator,
        rank=cfg.rank,
        world_size=cfg.world_size,
        n_frames=cfg.n_frames,
        detector=detector,
        detection_type=cfg.inference.detection_type,
    )
    logger.info(
        f"[{cfg.ds_name}] predicting {len(runner.frame_ids)} frames "
        f"({cfg.inference.detection_type}+"
        f"{cfg.inference.coarse_estimation_type})..."
    )
    preds = runner.get_predictions()
    results_path = save_predictions(preds, save_dir / "results")

    final = preds["final"]
    ds_short = cfg.ds_name.split(".")[0]
    csv = convert_results_to_bop(final, save_dir / f"{ds_short}.csv")
    logger.info(f"wrote {csv} ({len(final)} predictions)")

    summary = score_and_save(final, mesh_db)
    if summary:
        logger.info(f"summary: {summary}")

    return {
        "results_path": results_path,
        "pred_keys": list(preds.keys()),
        "save_dir": save_dir,
        "summary": summary,
    }
