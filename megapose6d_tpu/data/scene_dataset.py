"""Scene dataset abstractions (SceneObservation + map/iterable datasets).

Re-design of the reference's `datasets/scene_dataset.py:196-486`. The
observation container and dataset iteration protocol are host-side (numpy);
batching for the device happens in the pose dataset / prediction runner.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from .types import CameraData, ObjectData


@dataclasses.dataclass
class ObservationInfos:
    """(scene_dataset.py:177-190)"""

    scene_id: str = ""
    view_id: int = -1


@dataclasses.dataclass
class SceneObservation:
    """One annotated frame (scene_dataset.py:206-299).

    rgb: [H, W, 3] uint8; depth: [H, W] float32 meters or None;
    segmentation: [H, W] uint32 unique-id map or None.
    """

    rgb: np.ndarray | None = None
    depth: np.ndarray | None = None
    segmentation: np.ndarray | None = None
    infos: ObservationInfos = dataclasses.field(default_factory=ObservationInfos)
    object_datas: list[ObjectData] = dataclasses.field(default_factory=list)
    camera_data: CameraData = dataclasses.field(default_factory=CameraData)

    def gt_detections(self, min_visib_fract: float = 0.0) -> list[ObjectData]:
        """Objects usable as GT detections (scene_dataset.py:276-278
        fabricates detections from GT with score 1)."""
        out = []
        for obj in self.object_datas:
            if obj.bbox_modal is None:
                continue
            if (
                obj.visib_fract is not None
                and obj.visib_fract < min_visib_fract
            ):
                continue
            out.append(obj)
        return out


class SceneDataset:
    """Map-style dataset over a (scene_id, view_id) frame index
    (scene_dataset.py:384-428)."""

    def __init__(
        self,
        frame_index: pd.DataFrame | None,
        load_depth: bool = False,
        load_segmentation: bool = True,
    ):
        self.frame_index = frame_index
        self.load_depth = load_depth
        self.load_segmentation = load_segmentation

    def __len__(self) -> int:
        assert self.frame_index is not None
        return len(self.frame_index)

    def _load_scene_observation(
        self, infos: ObservationInfos
    ) -> SceneObservation:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> SceneObservation:
        assert self.frame_index is not None
        row = self.frame_index.iloc[idx]
        infos = ObservationInfos(
            scene_id=str(row["scene_id"]), view_id=int(row["view_id"])
        )
        return self._load_scene_observation(infos)

    def __iter__(self) -> Iterator[SceneObservation]:
        for i in range(len(self)):
            yield self[i]


class RandomIterableSceneDataset:
    """Infinite random sampling (scene_dataset.py:429-458)."""

    def __init__(self, scene_ds: SceneDataset, seed: int = 0):
        self.scene_ds = scene_ds
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[SceneObservation]:
        while True:
            yield self.scene_ds[self.rng.randrange(len(self.scene_ds))]


class IterableMultiSceneDataset:
    """Random mixture of infinite iterators (scene_dataset.py:461-486)."""

    def __init__(
        self, datasets: Sequence, seed: int = 0
    ):
        self.iterators = [iter(d) for d in datasets]
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[SceneObservation]:
        while True:
            yield next(self.rng.choice(self.iterators))
