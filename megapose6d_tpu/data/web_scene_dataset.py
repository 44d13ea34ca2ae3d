"""Tar-shard scene dataset (the 2M-image training-set format).

Re-design of the reference's `WebSceneDataset`
(megapose6d: src/megapose/datasets/web_scene_dataset.py:53-250). Same
on-disk contract — tar shards of ~1000 frames, each frame a key with
`rgb.png`, `segmentation.png`, `depth.png`, `camera_data.json`,
`object_datas.json`, `infos.json` — but implemented on stdlib `tarfile`
(the `webdataset` package is not a dependency): a writer, a random-access
reader, and an infinite shuffled iterator with a sample buffer.
"""

from __future__ import annotations

import io
import json
import random
import tarfile
from pathlib import Path
from typing import Iterator

import numpy as np

from .scene_dataset import (
    ObservationInfos,
    SceneDataset,
    SceneObservation,
)
from .types import CameraData, ObjectData


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _png_read(data: bytes) -> np.ndarray:
    # Native libpng/libjpeg decoder (C++ thread pool, megapose6d_tpu.native)
    # when the toolchain is present and the payload is PNG/JPEG; PIL
    # otherwise (magic-byte sniff, same guard as bop_scene_dataset._imread).
    from .. import native

    if native.available() and native.supports(data):
        return native.decode_image(data)
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


DEPTH_SCALE = 1000.0  # meters -> uint16 mm (web_scene_dataset.py convention)


def write_scene_ds_as_wds(
    observations: Iterator[SceneObservation],
    out_dir: str | Path,
    frames_per_shard: int = 1000,
    shard_format: str = "shard-{:06d}.tar",
    shard_offset: int = 0,
    frame_id_offset: int = 0,
) -> list[Path]:
    """Write shards (web_scene_dataset.py:write_scene_ds_as_wds:53-128).

    `shard_offset` / `frame_id_offset` let multiple datagen ranks write
    disjoint shard ranges of one dataset (the reference's chunk split,
    generate_shapenet_pbr.py:768-840)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    shards: list[Path] = []
    tar = None
    n_in_shard = 0
    frame_id = frame_id_offset

    def add(name: str, data: bytes):
        info = tarfile.TarInfo(name)
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    for obs in observations:
        if tar is None or n_in_shard >= frames_per_shard:
            if tar is not None:
                tar.close()
            path = out_dir / shard_format.format(len(shards) + shard_offset)
            shards.append(path)
            tar = tarfile.open(path, "w")
            n_in_shard = 0
        key = f"{frame_id:08d}"
        add(f"{key}.rgb.png", _png_bytes(obs.rgb))
        if obs.segmentation is not None:
            add(
                f"{key}.segmentation.png",
                _png_bytes(obs.segmentation.astype(np.uint16)),
            )
        if obs.depth is not None:
            d16 = np.clip(obs.depth * DEPTH_SCALE, 0, 65535).astype(np.uint16)
            add(f"{key}.depth.png", _png_bytes(d16))
        add(
            f"{key}.object_datas.json",
            json.dumps([o.to_json() for o in obs.object_datas]).encode(),
        )
        add(f"{key}.camera_data.json", obs.camera_data.to_json().encode())
        add(
            f"{key}.infos.json",
            json.dumps(
                {"scene_id": obs.infos.scene_id, "view_id": obs.infos.view_id}
            ).encode(),
        )
        n_in_shard += 1
        frame_id += 1
    if tar is not None:
        tar.close()
    return shards


def _decode_sample(parts: dict[str, bytes], load_depth: bool) -> SceneObservation:
    rgb = _png_read(parts["rgb.png"])[..., :3]
    seg = None
    if "segmentation.png" in parts:
        seg = _png_read(parts["segmentation.png"]).astype(np.uint32)
    depth = None
    if load_depth and "depth.png" in parts:
        depth = _png_read(parts["depth.png"]).astype(np.float32) / DEPTH_SCALE
    object_datas = [
        ObjectData.from_json(d)
        for d in json.loads(parts["object_datas.json"])
    ]
    camera_data = CameraData.from_json(parts["camera_data.json"].decode())
    infos_d = json.loads(parts.get("infos.json", b"{}"))
    infos = ObservationInfos(
        scene_id=str(infos_d.get("scene_id", "")),
        view_id=int(infos_d.get("view_id", -1)),
    )
    return SceneObservation(
        rgb=rgb,
        depth=depth,
        segmentation=seg,
        infos=infos,
        object_datas=object_datas,
        camera_data=camera_data,
    )


class WebSceneDataset(SceneDataset):
    """Random-access reader over a directory of shards
    (web_scene_dataset.py:131-222)."""

    def __init__(self, wds_dir: str | Path, load_depth: bool = False):
        self.wds_dir = Path(wds_dir)
        self.shard_paths = sorted(self.wds_dir.glob("*.tar"))
        assert self.shard_paths, f"no shards in {wds_dir}"
        # Index: key -> (shard_idx, member names).
        self.index: list[tuple[int, str]] = []
        self._members: dict[tuple[int, str], list[str]] = {}
        for si, path in enumerate(self.shard_paths):
            with tarfile.open(path) as tar:
                keys: dict[str, list[str]] = {}
                for name in tar.getnames():
                    key, _, _ = name.partition(".")
                    keys.setdefault(key, []).append(name)
                for key, names in keys.items():
                    self.index.append((si, key))
                    self._members[(si, key)] = names
        import pandas as pd

        super().__init__(
            pd.DataFrame(
                {
                    "scene_id": [str(s) for s, _ in self.index],
                    "view_id": list(range(len(self.index))),
                }
            ),
            load_depth=load_depth,
        )

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, idx: int) -> SceneObservation:
        si, key = self.index[idx]
        with tarfile.open(self.shard_paths[si]) as tar:
            parts = {}
            for name in self._members[(si, key)]:
                _, _, suffix = name.partition(".")
                parts[suffix] = tar.extractfile(name).read()
        return _decode_sample(parts, self.load_depth)


class IterableWebSceneDataset:
    """Infinite shard-cycling iterator with a shuffle buffer
    (web_scene_dataset.py:225-250: ResampledShards -> tar expand ->
    decode -> shuffle(buffer))."""

    def __init__(
        self,
        web_ds: WebSceneDataset,
        buffer_size: int = 100,
        seed: int = 0,
    ):
        self.web_ds = web_ds
        self.buffer_size = buffer_size
        self.rng = random.Random(seed)

    def _iter_shard(self, path: Path) -> Iterator[SceneObservation]:
        with tarfile.open(path) as tar:
            parts: dict[str, bytes] = {}
            current_key: str | None = None
            for member in tar:
                key, _, suffix = member.name.partition(".")
                if current_key is not None and key != current_key:
                    yield _decode_sample(parts, self.web_ds.load_depth)
                    parts = {}
                current_key = key
                parts[suffix] = tar.extractfile(member).read()
            if parts:
                yield _decode_sample(parts, self.web_ds.load_depth)

    def __iter__(self) -> Iterator[SceneObservation]:
        buffer: list[SceneObservation] = []
        while True:
            shards = list(self.web_ds.shard_paths)
            self.rng.shuffle(shards)
            for shard in shards:
                for obs in self._iter_shard(shard):
                    buffer.append(obs)
                    if len(buffer) >= self.buffer_size:
                        idx = self.rng.randrange(len(buffer))
                        buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
                        yield buffer.pop()
