"""BOP-format dataset writer.

Counterpart of `bop_scene_dataset.py`'s reader: writes the BOP directory
layout (scene_camera.json / scene_gt.json / scene_gt_info.json, rgb/,
depth/, mask_visib/, and models/ with models_info.json + PLYs in mm) so the
synthetic generator's output feeds the full BOP evaluation stack —
BOPDataset -> PredictionRunner -> BOPScoreMeter -> results CSV — and the
official bop_toolkit, end to end. The reference has no writer (its data
comes pre-packaged from the BOP challenge); format per
https://github.com/thodan/bop_toolkit/blob/master/docs/bop_datasets_format.md
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from ..meshes.io import TriMesh, save_ply
from .scene_dataset import SceneObservation


def bop_label(obj_id: int) -> str:
    """Canonical BOP object label ('obj_000014')."""
    return f"obj_{obj_id:06d}"


def write_bop_models(
    meshes: Iterable[tuple[int, TriMesh]],
    models_dir: str | Path,
    mesh_units: str = "m",
) -> Path:
    """Write `models/obj_XXXXXX.ply` (millimeters) + models_info.json.

    `meshes` yields (obj_id, TriMesh in `mesh_units`). models_info carries
    diameter and AABB in mm like the BOP toolkit expects.
    """
    models_dir = Path(models_dir)
    models_dir.mkdir(parents=True, exist_ok=True)
    scale = 1000.0 if mesh_units == "m" else 1.0
    infos = {}
    for obj_id, mesh in meshes:
        mm = mesh.scaled(scale)
        save_ply(mm, models_dir / f"obj_{obj_id:06d}.ply")
        v = mm.vertices
        infos[str(obj_id)] = {
            "diameter": mm.diameter(),
            "min_x": float(v[:, 0].min()),
            "min_y": float(v[:, 1].min()),
            "min_z": float(v[:, 2].min()),
            "size_x": float(v[:, 0].max() - v[:, 0].min()),
            "size_y": float(v[:, 1].max() - v[:, 1].min()),
            "size_z": float(v[:, 2].max() - v[:, 2].min()),
        }
    (models_dir / "models_info.json").write_text(json.dumps(infos, indent=1))
    return models_dir


def write_scene_ds_as_bop(
    observations: Iterator[SceneObservation],
    ds_dir: str | Path,
    split: str = "test",
    label_to_obj_id=None,
) -> Path:
    """Write observations as `<ds_dir>/<split>/<scene>/...` BOP scenes.

    Poses are stored camera<-model (SceneObservation carries TWO with
    TWC = I, matching the reader `bop_scene_dataset.py:108-121`), depth as
    uint16 millimeters with depth_scale=1.0, visible masks from the
    segmentation layer. `label_to_obj_id` maps labels to BOP ids (default:
    parse the `obj_NNNNNN` convention).
    """
    from PIL import Image

    from ..evaluation.bop import label_to_obj_id as parse_obj_id

    to_id = label_to_obj_id or parse_obj_id
    base = Path(ds_dir) / split
    scenes: dict[str, dict[str, dict]] = {}

    for obs in observations:
        scene = f"{int(obs.infos.scene_id):06d}"
        view = int(obs.infos.view_id)
        scene_dir = base / scene
        (scene_dir / "rgb").mkdir(parents=True, exist_ok=True)
        ann = scenes.setdefault(
            scene, {"scene_camera": {}, "scene_gt": {}, "scene_gt_info": {}}
        )

        Image.fromarray(obs.rgb).save(scene_dir / "rgb" / f"{view:06d}.png")
        if obs.depth is not None:
            (scene_dir / "depth").mkdir(exist_ok=True)
            d16 = np.clip(obs.depth * 1000.0, 0, 65535).astype(np.uint16)
            Image.fromarray(d16).save(scene_dir / "depth" / f"{view:06d}.png")

        K = np.asarray(obs.camera_data.K, np.float64)
        ann["scene_camera"][str(view)] = {
            "cam_K": K.reshape(-1).tolist(),
            "depth_scale": 1.0,
        }

        gt_rows, info_rows = [], []
        for n, obj in enumerate(obs.object_datas):
            TCO = np.asarray(obj.TWO, np.float64)
            gt_rows.append(
                {
                    "obj_id": int(to_id(obj.label)),
                    "cam_R_m2c": TCO[:3, :3].reshape(-1).tolist(),
                    "cam_t_m2c": (TCO[:3, 3] * 1000.0).tolist(),
                }
            )
            if obs.segmentation is not None:
                mask = (obs.segmentation == obj.unique_id).astype(np.uint8)
                (scene_dir / "mask_visib").mkdir(exist_ok=True)
                Image.fromarray(mask * 255).save(
                    scene_dir / "mask_visib" / f"{view:06d}_{n:06d}.png"
                )
                px = int(mask.sum())
                ys, xs = np.nonzero(mask)
                bbox = (
                    [int(xs.min()), int(ys.min()),
                     int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
                    if px
                    else [0, 0, 0, 0]
                )
            else:
                px = 0
                b = obj.bbox_modal
                bbox = (
                    [float(b[0]), float(b[1]),
                     float(b[2] - b[0]), float(b[3] - b[1])]
                    if b is not None
                    else [0, 0, 0, 0]
                )
            info_rows.append(
                {
                    "bbox_obj": bbox,
                    "bbox_visib": bbox,
                    "px_count_visib": px,
                    "px_count_all": px,
                    "px_count_valid": px,
                    "visib_fract": float(
                        obj.visib_fract if obj.visib_fract is not None else 1.0
                    ),
                }
            )
        ann["scene_gt"][str(view)] = gt_rows
        ann["scene_gt_info"][str(view)] = info_rows

    for scene, ann in scenes.items():
        scene_dir = base / scene
        for name, payload in ann.items():
            (scene_dir / f"{name}.json").write_text(json.dumps(payload))
    return base
