"""Inference configuration + detection helpers.

Mirrors the reference's `inference/types.py:33-100` contracts:
  - DetectionsType = PandasTensorCollection(infos[label, score, instance_id,
    batch_im_id], bboxes [N, 4] xyxy)
  - PoseEstimatesType = PandasTensorCollection(infos[label, score, ...],
    poses [N, 4, 4])
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd

from ..data.tensor_collection import PandasTensorCollection


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Analog of the reference `InferenceConfig` (inference/types.py:89-100),
    plus TPU-specific static-shape knobs."""

    detection_type: str = "gt"  # "gt" | "detector" | "exte rnal"
    coarse_estimation_type: str = "SO3_grid"
    SO3_grid_size: int = 576
    # Hierarchical coarse scoring (TPU-first; 0 disables): score a small
    # probe grid of SO3_prune_grid_size rotations first, keep the top
    # SO3_prune_keep parents, then score only their Voronoi children from
    # the full grid. Cuts coarse renders ~3x at 576 (72 + keep*C vs 576);
    # final hypotheses always come from the full grid.
    SO3_prune_grid_size: int = 0
    SO3_prune_keep: int = 8
    # Rasterization resolution of the coarse SO(3)-sweep renders (None =
    # the model's render_size). Renders are bilinearly upsampled to the
    # model's input size before the CNN, so trained checkpoints apply
    # unchanged (PosePredictorConfig.render_at); the raster cost — ~70%
    # of end-to-end pipeline time at the full 576 grid — drops with the
    # pixel-tile count. Rescoring of refined hypotheses stays at full
    # resolution (it is only D*top_k scores). Validated by the
    # demo_finalize_pipeline coarse_res_ab A/B before bench promotes it.
    coarse_render_size: tuple[int, int] | None = None
    n_refiner_iterations: int = 5
    n_pose_hypotheses: int = 5
    run_depth_refiner: bool = False
    depth_refiner: str | None = None
    bsz_images: int = 576  # coarse scoring chunk (reference default)
    bsz_objects: int = 16  # refiner chunk
    # TPU static-shape padding: detections per image are padded to this.
    max_detections: int = 8
    # Run coarse->topK->refine->rescore as ONE XLA program (no host syncs
    # between phases; per-phase timing then only reports 'total').
    fused_pipeline: bool = False
    # Rescore refined hypotheses (the final top-1 selection,
    # pose_estimator.py:602-613) in float32 even when the coarse model
    # computes in bf16: logit gaps between refined hypotheses are small
    # enough that bf16 can scramble their order (measured: the same
    # coarse checkpoint ranks a SO(3) grid at 37.9 deg top-1 in f32 vs
    # 62.0 deg in bf16), while the rescore phase is only D*top_k scores
    # — precision there is nearly free. The bulk 576-grid sweep keeps
    # the model's own dtype for speed.
    rescore_f32: bool = False


def make_detections(
    labels: list[str],
    bboxes: np.ndarray,
    scores: np.ndarray | None = None,
    batch_im_ids: np.ndarray | None = None,
) -> PandasTensorCollection:
    """Build a DetectionsType (inference/utils.py:make_detections_from_object_data:214)."""
    n = len(labels)
    infos = pd.DataFrame(
        {
            "label": labels,
            "score": np.ones(n) if scores is None else np.asarray(scores),
            "batch_im_id": np.zeros(n, np.int64)
            if batch_im_ids is None
            else np.asarray(batch_im_ids),
            "instance_id": np.arange(n, dtype=np.int64),
        }
    )
    return PandasTensorCollection(
        infos, bboxes=np.asarray(bboxes, np.float32).reshape(n, 4)
    )


def filter_detections(
    detections: PandasTensorCollection,
    labels: list[str] | None = None,
    one_instance_per_class: bool = False,
) -> PandasTensorCollection:
    """Label-set and one-instance-per-class filtering
    (inference/utils.py:filter_detections:174)."""
    keep = np.ones(len(detections), bool)
    if labels is not None:
        keep &= detections.infos["label"].isin(labels).to_numpy()
    out = detections[np.nonzero(keep)[0]]
    if one_instance_per_class and len(out):
        order = np.argsort(-out.infos["score"].to_numpy())
        seen: set[str] = set()
        sel = []
        for i in order:
            lbl = out.infos.iloc[i]["label"]
            if lbl not in seen:
                seen.add(lbl)
                sel.append(i)
        out = out[np.asarray(sorted(sel), int)]
    return out


def add_instance_id(
    detections: PandasTensorCollection,
) -> PandasTensorCollection:
    """Assign per-(batch_im_id, label) instance ids
    (inference/utils.py:add_instance_id:151)."""
    infos = detections.infos.copy()
    infos["instance_id"] = infos.groupby(
        ["batch_im_id", "label"], sort=False
    ).cumcount()
    return PandasTensorCollection(infos, **detections.tensors)


def make_cameras(camera_datas) -> PandasTensorCollection:
    """CameraData list -> camera collection (inference/utils.py:197)."""
    infos = pd.DataFrame(
        {"batch_im_id": np.arange(len(camera_datas), dtype=np.int64)}
    )
    K = np.stack([np.asarray(c.K, np.float32) for c in camera_datas])
    return PandasTensorCollection(infos, K=K)


def make_pose_estimates(
    labels: list[str],
    poses: np.ndarray,
    extra_infos: dict | None = None,
) -> PandasTensorCollection:
    n = len(labels)
    infos = pd.DataFrame({"label": labels})
    for k, v in (extra_infos or {}).items():
        infos[k] = v
    return PandasTensorCollection(
        infos, poses=np.asarray(poses, np.float32).reshape(n, 4, 4)
    )
