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
    n_refiner_iterations: int = 5
    n_pose_hypotheses: int = 5
    run_depth_refiner: bool = False
    depth_refiner: str | None = None
    bsz_images: int = 576  # coarse scoring chunk (reference default)
    bsz_objects: int = 16  # refiner chunk
    # TPU static-shape padding: detections per image are padded to this.
    max_detections: int = 8


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
