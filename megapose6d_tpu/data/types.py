"""Scene / observation data types with reference-compatible JSON round-trips.

Re-design of the reference's `inference/types.py:103-235` (ObservationTensor)
and `datasets/scene_dataset.py:71-190` (ObjectData/CameraData). Pose JSON
format is `[ [qx,qy,qz,qw], [tx,ty,tz] ]` pairs, identical to the reference's
`transform_to_list` so inputs/outputs interoperate (e.g. the barbecue-sauce
example's `inputs/object_data.json` / `outputs/object_data.json`).

Internal image layout is NHWC float32 (TPU-native); NCHW inputs are accepted
and transposed at this edge.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from ..ops import se3


def _pose_to_list(T: np.ndarray) -> list:
    import jax.numpy as jnp

    q = np.asarray(se3.quat_from_rotmat(jnp.asarray(T[:3, :3], jnp.float32)))
    return [q.tolist(), T[:3, 3].tolist()]


def _pose_from_list(item: list) -> np.ndarray:
    import jax.numpy as jnp

    quat, trans = item
    R = np.asarray(se3.rotmat_from_quat(jnp.asarray(quat, jnp.float32)))
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = trans
    return T


@dataclasses.dataclass
class ObjectData:
    """Per-object annotation (scene_dataset.py:85-120)."""

    label: str
    TWO: np.ndarray | None = None  # (4, 4)
    unique_id: int | None = None
    bbox_amodal: np.ndarray | None = None  # (4,) xyxy
    bbox_modal: np.ndarray | None = None
    visib_fract: float | None = None
    TWO_init: np.ndarray | None = None

    def to_json(self) -> dict:
        d: dict = dict(label=self.label)
        for k in ("TWO", "TWO_init"):
            v = getattr(self, k)
            if v is not None:
                d[k] = _pose_to_list(np.asarray(v))
        for k in ("bbox_amodal", "bbox_modal"):
            v = getattr(self, k)
            if v is not None:
                d[k] = np.asarray(v).tolist()
        for k in ("visib_fract", "unique_id"):
            v = getattr(self, k)
            if v is not None:
                d[k] = v
        return d

    @staticmethod
    def from_json(d: dict) -> "ObjectData":
        data = ObjectData(label=d["label"])
        for k in ("TWO", "TWO_init"):
            if k in d:
                setattr(data, k, _pose_from_list(d[k]))
        for k in ("unique_id", "visib_fract"):
            if k in d:
                setattr(data, k, d[k])
        for k in ("bbox_amodal", "bbox_modal"):
            if k in d:
                setattr(data, k, np.array(d[k], dtype=np.float64))
        return data


def object_data_from_json_path(path: str | Path) -> list[ObjectData]:
    return [ObjectData.from_json(d) for d in json.loads(Path(path).read_text())]


def object_data_to_json_path(objects: list[ObjectData], path: str | Path) -> None:
    Path(path).write_text(json.dumps([o.to_json() for o in objects]))


@dataclasses.dataclass
class CameraData:
    """Camera annotation (scene_dataset.py:123-174)."""

    K: np.ndarray | None = None  # (3, 3)
    resolution: tuple[int, int] | None = None  # (h, w)
    TWC: np.ndarray | None = None  # (4, 4)
    camera_id: str | None = None
    TWC_init: np.ndarray | None = None

    def to_json(self) -> str:
        d: dict = {}
        for k in ("TWC", "TWC_init"):
            v = getattr(self, k)
            if v is not None:
                d[k] = _pose_to_list(np.asarray(v))
        if self.K is not None:
            d["K"] = np.asarray(self.K).tolist()
        if self.camera_id is not None:
            d["camera_id"] = self.camera_id
        if self.resolution is not None:
            d["resolution"] = list(self.resolution)
        return json.dumps(d)

    @staticmethod
    def from_json(data_str: str) -> "CameraData":
        d = json.loads(data_str)
        data = CameraData()
        for k in ("TWC", "TWC_init"):
            if k in d:
                setattr(data, k, _pose_from_list(d[k]))
        if "K" in d:
            data.K = np.array(d["K"], dtype=np.float64)
        if "camera_id" in d:
            data.camera_id = d["camera_id"]
        if "resolution" in d:
            h, w = d["resolution"]
            data.resolution = (int(h), int(w))
        return data


@dataclasses.dataclass
class ObservationTensor:
    """A batch of images + intrinsics (inference/types.py:103-235).

    `images: [B, H, W, C]` float32, rgb in [0, 1], optional 4th channel =
    metric depth. `K: [B, 3, 3]` float32.
    """

    images: np.ndarray
    K: np.ndarray

    def __post_init__(self):
        assert self.images.ndim == 4, self.images.shape
        assert self.K.shape == (self.images.shape[0], 3, 3), self.K.shape

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]

    @property
    def channels(self) -> int:
        return self.images.shape[-1]

    @property
    def resolution(self) -> tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    @property
    def depth(self) -> np.ndarray | None:
        return self.images[..., 3] if self.channels == 4 else None

    @staticmethod
    def from_numpy(
        rgb: np.ndarray, depth: np.ndarray | None = None, K: np.ndarray | None = None
    ) -> "ObservationTensor":
        """Build from a single HWC uint8 rgb (+ HW depth in meters) + K,
        matching `ObservationTensor.from_numpy` (inference/types.py:169-235).
        """
        assert rgb.ndim == 3 and rgb.shape[-1] == 3, rgb.shape
        assert K is not None
        img = rgb.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if depth is not None:
            img = np.concatenate(
                [img, depth.astype(np.float32)[..., None]], axis=-1
            )
        return ObservationTensor(
            images=img[None], K=np.asarray(K, np.float32)[None]
        )

    @staticmethod
    def from_torch_layout(images_nchw: np.ndarray, K: np.ndarray) -> "ObservationTensor":
        """Accept the reference's NCHW layout and transpose once."""
        return ObservationTensor(
            images=np.ascontiguousarray(
                np.moveaxis(np.asarray(images_nchw), 1, -1),
            ).astype(np.float32),
            K=np.asarray(K, np.float32),
        )

    def is_valid(self) -> bool:
        """Validation contract (inference/types.py:143-167)."""
        img = self.images
        ok = img.dtype == np.float32 and img.ndim == 4
        ok = ok and img.shape[-1] in (3, 4)
        ok = ok and 0.0 <= float(img[..., :3].min()) and float(img[..., :3].max()) <= 1.0
        return bool(ok)
