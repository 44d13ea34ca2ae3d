"""Prediction + evaluation runners.

Re-design of the reference's `PredictionRunner`
(megapose6d: src/megapose/evaluation/prediction_runner.py:49-209) and
`EvaluationRunner` (evaluation_runner.py:36-95). Frames can be sharded
across processes deterministically with `shard_frames` (the
`DistributedSceneSampler` analog, datasets/samplers.py:41-55); results are
merged host-side by the caller (process_allgather or shared FS).
"""

from __future__ import annotations

import time
import numpy as np
import pandas as pd

from ..data.scene_dataset import SceneDataset, SceneObservation
from ..data.tensor_collection import PandasTensorCollection, concatenate
from ..data.types import ObservationTensor
from ..inference.pose_estimator import PoseEstimator
from ..inference.types import make_detections


def shard_frames(n_frames: int, rank: int, world_size: int) -> np.ndarray:
    """Deterministic frame split (samplers.py:41-55 np.array_split)."""
    return np.array_split(np.arange(n_frames), world_size)[rank]


class PredictionRunner:
    def __init__(
        self,
        scene_ds: SceneDataset,
        estimator: PoseEstimator,
        rank: int = 0,
        world_size: int = 1,
        n_frames: int | None = None,
        detector=None,
        detection_type: str = "gt",
    ):
        self.scene_ds = scene_ds
        self.estimator = estimator
        self.detector = detector
        self.detection_type = detection_type
        if detection_type == "detector":
            assert detector is not None, "detector required"
        ids = shard_frames(len(scene_ds), rank, world_size)
        if n_frames is not None:
            ids = ids[:n_frames]
        self.frame_ids = ids

    def get_detections(self, obs: SceneObservation, observation):
        """GT detections (prediction_runner.py:96-98 via
        SceneObservation.as_pandas_tensor_collection) or detector boxes
        (prediction_runner.py:99-107 -> Detector.get_detections)."""
        if self.detection_type == "gt":
            gt_objects = obs.gt_detections()
            if not gt_objects:
                return None
            labels = [o.label for o in gt_objects]
            bboxes = np.stack([o.bbox_modal for o in gt_objects])
            return make_detections(labels, bboxes)
        detections = self.detector.get_detections(observation)
        return detections if len(detections) else None

    def run_inference_on_observation(
        self, obs: SceneObservation
    ) -> tuple[PandasTensorCollection, dict] | None:
        observation = ObservationTensor.from_numpy(
            obs.rgb, obs.depth, obs.camera_data.K
        )
        detections = self.get_detections(obs, observation)
        if detections is None:
            return None
        return self.estimator.run_inference_pipeline(observation, detections)

    def get_predictions(self) -> dict[str, PandasTensorCollection]:
        """Per-view pipeline over this shard's frames
        (prediction_runner.py:120-209). Returns stage-keyed collections
        like the reference: 'final' plus 'refiner/iteration=N' snapshots
        of the best hypothesis at each refiner iteration."""
        stages: dict[str, list[PandasTensorCollection]] = {}

        def add(key, data):
            stages.setdefault(key, []).append(data)

        for frame_id in self.frame_ids:
            obs = self.scene_ds[int(frame_id)]
            t0 = time.monotonic()
            result = self.run_inference_on_observation(obs)
            if result is None:
                continue
            data, extra = result
            elapsed = time.monotonic() - t0
            data.infos["scene_id"] = int(obs.infos.scene_id)
            data.infos["view_id"] = int(obs.infos.view_id)
            data.infos["time"] = elapsed
            add("final", data)
            traj = extra.get("refiner", {}).get("trajectory")
            if traj is not None and traj.ndim == 5:
                # [n_iter, D, K, 4, 4]: keep ALL K refined hypotheses per
                # iteration, like the reference (prediction_runner.py:
                # 120-209 stores every hypothesis row per iteration); the
                # one that becomes `final` is recoverable via
                # hypothesis_id == argmax(pose_logits).
                n_iter, D, K = traj.shape[:3]
                logits = extra["refiner"].get("pose_logits")
                for it in range(n_iter):
                    infos_k = data.infos.loc[
                        data.infos.index.repeat(K)
                    ].reset_index(drop=True)
                    infos_k["hypothesis_id"] = np.tile(np.arange(K), D)
                    if logits is not None:
                        infos_k["pose_logit"] = np.asarray(logits).reshape(
                            D * K
                        )
                    it_data = PandasTensorCollection(
                        infos_k, poses=traj[it].reshape(D * K, 4, 4)
                    )
                    add(f"refiner/iteration={it + 1}", it_data)
        if not stages:
            return {"final": PandasTensorCollection(
                pd.DataFrame(columns=["label"]), poses=np.zeros((0, 4, 4))
            )}
        return {k: concatenate(v) for k, v in stages.items()}


class EvaluationRunner:
    """Meter-driven evaluation (evaluation_runner.py:36-95)."""

    def __init__(self, scene_ds: SceneDataset, meters: dict):
        self.scene_ds = scene_ds
        self.meters = meters

    def evaluate(
        self, predictions: PandasTensorCollection
    ) -> dict[str, dict]:
        # Build GT collections per view and feed meters.
        by_view = predictions.infos.groupby(["scene_id", "view_id"]).groups
        for (scene_id, view_id), row_ids in by_view.items():
            row_ids = np.asarray(row_ids)
            frame = self._find_frame(str(scene_id), int(view_id))
            gt_objects = frame.gt_detections()
            gt = PandasTensorCollection(
                # instance_id mirrors the detection order fed to the
                # pipeline (gt_detections -> make_detections arange), so
                # multi-instance scenes match one-to-one.
                pd.DataFrame(
                    {
                        "label": [o.label for o in gt_objects],
                        "instance_id": np.arange(
                            len(gt_objects), dtype=np.int64
                        ),
                    }
                ),
                poses=np.stack([o.TWO for o in gt_objects]).astype(
                    np.float32
                ),
                K=np.tile(
                    frame.camera_data.K[None].astype(np.float32),
                    (len(gt_objects), 1, 1),
                ),
            )
            pred = predictions[row_ids]
            for meter in self.meters.values():
                meter.add(pred, gt, frame=frame)
        return {k: m.summary() for k, m in self.meters.items()}

    def _find_frame(self, scene_id: str, view_id: int) -> SceneObservation:
        fi = self.scene_ds.frame_index

        def norm(s):
            # BOP scene dirs are zero-padded ("000048") while prediction
            # infos carry plain ints; compare canonicalized.
            s = str(s)
            return str(int(s)) if s.isdigit() else s

        rows = fi[
            (fi["scene_id"].astype(str).map(norm) == norm(scene_id))
            & (fi["view_id"] == view_id)
        ]
        assert len(rows) == 1, (scene_id, view_id, len(rows))
        return self.scene_ds[int(rows.index[0])]
