"""ModelNet evaluation dataset with DeepIM initial poses.

Re-design of the reference's `DeepImModelNetDataset`
(megapose6d: src/megapose/datasets/deepim_modelnet.py:50-176): frames pair a
rendered ModelNet view (GT pose `TWO`) with DeepIM's published initial pose
estimate (`TWO_init`), consumed through the estimator's external-init path
(`coarse_estimation_type="external"`).

Expected layout (the DeepIM evaluation release):
  <root>/<category>/<split>/
    <model>_<view>-color.png
    <model>_<view>-depth.png          (uint16, depth_scale)
    <model>_<view>-pose.txt           (4x4 GT TWO, row-major)
    <model>_<view>-pose_init.txt      (4x4 DeepIM init)
  <root>/<category>/camera.json       ({"K": ..., "resolution": [h, w]})
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

from .scene_dataset import ObservationInfos, SceneDataset, SceneObservation
from .types import CameraData, ObjectData


class DeepImModelNetDataset(SceneDataset):
    def __init__(
        self,
        root: str | Path,
        category: str,
        split: str = "test",
        load_depth: bool = False,
        depth_scale: float = 1000.0,
        n_objects: int | None = None,
    ):
        self.root = Path(root)
        self.category = category
        self.split = split
        self.depth_scale = depth_scale
        self.base = self.root / category / split

        cam_path = self.root / category / "camera.json"
        cam = json.loads(cam_path.read_text())
        self.K = np.asarray(cam["K"], np.float64).reshape(3, 3)
        self.resolution = tuple(cam.get("resolution", (480, 640)))

        keys = sorted(
            p.name[: -len("-color.png")]
            for p in self.base.glob("*-color.png")
        )
        if n_objects is not None:
            keys = keys[:n_objects]
        self.keys = keys
        super().__init__(
            pd.DataFrame(
                {"scene_id": [category] * len(keys),
                 "view_id": list(range(len(keys)))}
            ),
            load_depth=load_depth,
        )

    def _label(self, key: str) -> str:
        model = key.rsplit("_", 1)[0]
        return f"modelnet_{self.category}_{model}"

    def __getitem__(self, idx: int) -> SceneObservation:
        from PIL import Image

        key = self.keys[idx]
        rgb = np.asarray(Image.open(self.base / f"{key}-color.png"))[..., :3]
        depth = None
        if self.load_depth:
            depth = (
                np.asarray(
                    Image.open(self.base / f"{key}-depth.png")
                ).astype(np.float32)
                / self.depth_scale
            )
        TWO = np.loadtxt(self.base / f"{key}-pose.txt").reshape(4, 4)
        TWO_init = None
        init_path = self.base / f"{key}-pose_init.txt"
        if init_path.exists():
            TWO_init = np.loadtxt(init_path).reshape(4, 4)

        h, w = rgb.shape[:2]
        obj = ObjectData(
            label=self._label(key),
            TWO=TWO,
            TWO_init=TWO_init,
            unique_id=1,
            bbox_modal=_bbox_from_pose(TWO, self.K, (h, w)),
            visib_fract=1.0,
        )
        return SceneObservation(
            rgb=rgb,
            depth=depth,
            infos=ObservationInfos(scene_id=self.category, view_id=idx),
            object_datas=[obj],
            camera_data=CameraData(K=self.K, resolution=(h, w)),
        )


def _bbox_from_pose(
    TWO: np.ndarray, K: np.ndarray, hw: tuple[int, int], half_extent=0.06
) -> np.ndarray:
    """Approximate box from the projected unit-cube extent (ModelNet
    meshes are normalized; DeepIM evaluates with GT-centered boxes)."""
    corners = np.array(
        [
            [sx * half_extent, sy * half_extent, sz * half_extent, 1.0]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ]
    )
    pc = (TWO @ corners.T).T[:, :3]
    z = np.maximum(pc[:, 2], 1e-3)
    u = K[0, 0] * pc[:, 0] / z + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    h, w = hw
    return np.asarray(
        [
            np.clip(u.min(), 0, w - 1),
            np.clip(v.min(), 0, h - 1),
            np.clip(u.max(), 0, w - 1),
            np.clip(v.max(), 0, h - 1),
        ]
    )


class PickleSceneDataset(SceneDataset):
    """Trivial pickled-observation dataset for debugging
    (datasets/pickle_dataset.py:27-42)."""

    def __init__(self, paths: list[str | Path]):
        self.paths = [Path(p) for p in paths]
        super().__init__(
            pd.DataFrame(
                {"scene_id": ["0"] * len(self.paths),
                 "view_id": list(range(len(self.paths)))}
            )
        )

    def __getitem__(self, idx: int) -> SceneObservation:
        import pickle

        with open(self.paths[idx], "rb") as fh:
            return pickle.load(fh)
