"""String-name dataset registry.

Re-design of the reference's `datasets_cfg`
(megapose6d: src/megapose/datasets/datasets_cfg.py:65-333) with the full
named-dataset surface: BOP19 challenge splits with per-dataset label
formats, non-challenge BOP splits, PBR training sets, ModelNet scene +
object sets, ShapeNet/GSO object sets with `filters=` / `nobjects=`
modifiers, and webdataset shards. All rooted at `MEGAPOSE_DATA_DIR`.

`*.panda3d` object names resolve to the same BOP model dirs as the plain
names: the reference needed a Panda3D `.bam` conversion step
(datasets_cfg.py:229-250); our rasterizer consumes the PLY/OBJ sources
directly, so the converted trees don't exist and aren't needed.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

from .. import config
from .bop_scene_dataset import BOPDataset, load_bop_object_dataset
from .modelnet import DeepImModelNetDataset
from .object_datasets import (
    make_directory_object_dataset,
    make_gso_object_dataset,
    make_modelnet_object_dataset,
    make_shapenet_object_dataset,
)
from .web_scene_dataset import WebSceneDataset

BOP_DATASET_NAMES = (
    "lm", "lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv",
    "ruapc", "hope", "tyol",
)

# (split, label_format) per BOP dataset for the .bop19 challenge names
# (datasets_cfg.py:72-116: hb/tless use the primesense test split, lmo
# shares lm's models/labels).
_BOP19 = {
    "hb": ("test_primesense", "hb-{label}"),
    "icbin": ("test", "icbin-{label}"),
    "itodd": ("test", "itodd-{label}"),
    "lmo": ("test", "lm-{label}"),
    "tless": ("test_primesense", "tless-{label}"),
    "tudl": ("test", "tudl-{label}"),
    "ycbv": ("test", "ycbv-{label}"),
    "ruapc": ("test", "ruapc-{label}"),
    "hope": ("test", "hope-{label}"),
    "tyol": ("test", "tyol-{label}"),
    "lm": ("test", "lm-{label}"),
}

# Non-challenge splits (datasets_cfg.py:118-143).
_BOP_EXTRA_SPLITS = {
    "tless.primesense.train": ("tless", "train_primesense", "tless-{label}"),
    "tless.primesense.test": ("tless", "test_primesense", "tless-{label}"),
    "ycbv.train.real": ("ycbv", "train_real", "ycbv-{label}"),
    "ycbv.train.synt": ("ycbv", "train_synt", "ycbv-{label}"),
    "ycbv.test": ("ycbv", "test", "ycbv-{label}"),
    "lmo.test": ("lmo", "test", "lm-{label}"),
    "hb.val": ("hb", "val_primesense", "hb-{label}"),
    "itodd.val": ("itodd", "val", "itodd-{label}"),
    "tudl.train.real": ("tudl", "train_real", "tudl-{label}"),
}

_PBR_DATASETS = ("hb", "icbin", "itodd", "lm", "tless", "tudl", "ycbv")

# DeepIM's ModelNet eval categories with reduced object counts
# (datasets_cfg.py:170-181).
_MODELNET_30 = {
    "bathtub", "bookshelf", "guitar", "range_hood", "sofa", "wardrobe",
    "tv_stand",
}

# ShapeNet categories overlapping ModelNet (shapenet filter
# `remove_modelnet`, datasets_cfg.py:292-299 via SHAPENET_MODELNET_CATEGORIES).
SHAPENET_MODELNET_CATEGORIES = {
    "airplane", "bathtub", "bench", "bookshelf", "bottle", "bowl", "car",
    "chair", "guitar", "lamp", "laptop", "piano", "sofa", "table",
}


def keep_bop19(ds: BOPDataset) -> BOPDataset:
    """Restrict the frame index to the BOP19 challenge targets
    (datasets_cfg.py:keep_bop19:53-62)."""
    targets_path = ds.ds_dir / "test_targets_bop19.json"
    targets = pd.read_json(targets_path)
    targets = targets.rename(columns={"im_id": "view_id"})
    targets = targets.loc[:, ["scene_id", "view_id"]].drop_duplicates()
    # frame_index scene_id is the zero-padded dir name (str); targets use
    # int scene ids.
    targets["scene_id"] = targets["scene_id"].map(lambda s: f"{int(s):06d}")
    index = ds.frame_index.merge(
        targets, on=["scene_id", "view_id"]
    ).reset_index(drop=True)
    assert len(index) == len(targets), (len(index), len(targets))
    ds.frame_index = index
    return ds


def make_scene_dataset(
    name: str,
    load_depth: bool = False,
    data_dir: Path | None = None,
    n_frames: int | None = None,
):
    """(datasets_cfg.py:make_scene_dataset:65-195)"""
    ds = None
    if name.startswith("webdataset."):
        wds_name = name.split(".", 1)[1]
        wds_root = Path(data_dir) if data_dir else config.WDS_DS_DIR
        ds = WebSceneDataset(wds_root / wds_name, load_depth=load_depth)
    elif name.startswith("modelnet."):
        _, category, split = name.split(".")
        n_objects = 30 if category in _MODELNET_30 else 50
        ds = DeepImModelNetDataset(
            (Path(data_dir) if data_dir else config.LOCAL_DATA_DIR)
            / "modelnet40",
            category=category,
            split=split,
            n_objects=n_objects,
            load_depth=load_depth,
        )
    else:
        bop_dir = Path(data_dir or config.BOP_DS_DIR)
        ds_name, _, variant = name.partition(".")
        if variant == "bop19":
            # Unregistered names (e.g. generated synthetic BOP trees) get
            # the generic test split with obj_NNNNNN labels.
            split, fmt = _BOP19.get(ds_name, ("test", "obj_{label}"))
            ds = BOPDataset(
                bop_dir / ds_name, split=split, label_format=fmt,
                load_depth=load_depth,
            )
            if (ds.ds_dir / "test_targets_bop19.json").exists():
                ds = keep_bop19(ds)
        elif name in _BOP_EXTRA_SPLITS:
            dirname, split, fmt = _BOP_EXTRA_SPLITS[name]
            ds = BOPDataset(
                bop_dir / dirname, split=split, label_format=fmt,
                load_depth=load_depth,
            )
        elif variant == "pbr" and ds_name in _PBR_DATASETS:
            ds = BOPDataset(
                bop_dir / ds_name, split="train_pbr",
                label_format=f"{'lm' if ds_name == 'lmo' else ds_name}-{{label}}",
                load_depth=load_depth,
            )
        elif variant in ("", "test", "train_real"):
            # Generic fallback (round-1 surface, kept for BC): plain
            # obj_NNNNNN labels.
            split = {"": "test", "test": "test", "train_real": "train_real"}[
                variant
            ]
            ds = BOPDataset(
                bop_dir / ds_name, split=split, load_depth=load_depth
            )
    if ds is None:
        raise ValueError(f"unknown scene dataset: {name}")
    if n_frames is not None and getattr(ds, "frame_index", None) is not None:
        ds.frame_index = ds.frame_index.iloc[:n_frames].reset_index(drop=True)
    return ds


def _bop_object_ds(bop_dir: Path, dirname: str, models: str, fmt: str):
    models_dir = bop_dir / dirname / models
    if not models_dir.exists():
        raise FileNotFoundError(models_dir)
    return load_bop_object_dataset(models_dir, label_format=fmt)


def make_object_dataset(name: str, data_dir: Path | None = None):
    """(datasets_cfg.py:make_object_dataset:198-333)"""
    bop_dir = Path(data_dir or config.BOP_DS_DIR)
    root = Path(data_dir) if data_dir else config.LOCAL_DATA_DIR

    # `.panda3d` converted-model names alias the originals (see module
    # docstring).
    base_name = name[: -len(".panda3d")] if name.endswith(".panda3d") else name

    if base_name == "tless.cad":
        return _bop_object_ds(bop_dir, "tless", "models_cad", "tless-{label}")
    if base_name == "tless.eval":
        return _bop_object_ds(bop_dir, "tless", "models_eval", "tless-{label}")
    if base_name == "tless.reconst":
        return _bop_object_ds(
            bop_dir, "tless", "models_reconst", "tless-{label}"
        )
    if base_name in ("lm", "lmo"):
        return _bop_object_ds(bop_dir, "lm", "models", "lm-{label}")
    if base_name in BOP_DATASET_NAMES:
        return _bop_object_ds(
            bop_dir, base_name, "models", f"{base_name}-{{label}}"
        )

    # GSO: gso.orig / gso.normalized / gso.nobjects=N.split
    if name.startswith("gso."):
        rest = name[len("gso."):]
        n_objects = None
        if rest.startswith("nobjects="):
            head, _, rest = rest.partition(".")
            n_objects = int(head.split("=")[1])
        split = rest or "orig"
        if split == "panda3d":
            split = "orig"
        gso_dir = root / "gso" / f"models_{split}"
        ds = make_gso_object_dataset(gso_dir)
        if n_objects is not None:
            rng = np.random.RandomState(0)
            keep = set(
                rng.choice(
                    [o.label for o in ds.objects], n_objects, replace=False
                ).tolist()
            )
            ds = ds.filter_objects(keep)
        return ds

    # ShapeNet: shapenet.filters=a,b.split
    if name.startswith("shapenet."):
        rest = name[len("shapenet."):]
        filters: list[str] = []
        if rest.startswith("filters="):
            head, _, rest = rest.partition(".")
            filters = head.split("=")[1].split(",")
        split = rest or "orig"
        shapenet_dir = root / "shapenetcorev2" / f"models_{split}"
        if not shapenet_dir.exists():
            shapenet_dir = root / "shapenetcorev2"
        ds = make_shapenet_object_dataset(shapenet_dir)
        for f in filters:
            if f == "remove_modelnet":
                keep = {
                    o.label
                    for o in ds.objects
                    if not any(
                        c in o.label for c in SHAPENET_MODELNET_CATEGORIES
                    )
                }
            else:
                stats = (
                    root / "shapenetcorev2" / "stats" / f"shapenet_{f}"
                ).with_suffix(".json")
                keep = set(json.loads(stats.read_text()))
            ds = ds.filter_objects(keep)
        return ds

    # ModelNet: modelnet.<category>.<split>[.rescaled|.orig]
    if name.startswith("modelnet."):
        parts = name.split(".")
        category, split = parts[1], parts[2]
        n_objects = 30 if category in _MODELNET_30 else 50
        return make_modelnet_object_dataset(
            root / "modelnet40", category=category, split=split,
            n_objects=n_objects,
        )

    # Flat mesh directory (urdf_dataset.py-style)
    if name.startswith("dir:"):
        return make_directory_object_dataset(name[len("dir:"):])

    # Unregistered BOP-layout tree (e.g. generated synthetic datasets):
    # <bop_dir>/<name>/models with obj_NNNNNN labels.
    generic = bop_dir / name.split(".")[0] / "models"
    if generic.exists():
        return load_bop_object_dataset(generic)

    raise ValueError(f"unknown object dataset: {name}")


def make_urdf_dataset(name: str, data_dir: Path | None = None):
    """URDF-era mesh dirs (datasets_cfg.py:make_urdf_dataset:336-380):
    resolved as flat mesh-directory scans of LOCAL_DATA_DIR/urdfs."""
    root = (Path(data_dir) if data_dir else config.LOCAL_DATA_DIR) / "urdfs"
    return make_directory_object_dataset(root / name)


def get_obj_ds_info(ds_name: str) -> tuple[str, str]:
    """(eval driver helper, datasets_cfg.py:get_obj_ds_info:383-422):
    returns (object_ds_name, urdf_ds_name) for a scene-dataset name."""
    ds = ds_name.split(".")[0]
    if ds == "tless":
        return "tless.cad", "tless.cad"
    if ds in BOP_DATASET_NAMES:
        return ds, ds
    if ds == "modelnet":
        parts = ds_name.split(".")
        return f"modelnet.{parts[1]}.{parts[2]}", ds_name
    raise ValueError(ds_name)
