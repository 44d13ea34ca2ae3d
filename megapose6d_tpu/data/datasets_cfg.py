"""String-name dataset registry.

Re-design of the reference's `datasets_cfg`
(megapose6d: src/megapose/datasets/datasets_cfg.py:65-333): named scene /
object datasets resolved against `MEGAPOSE_DATA_DIR`. Names follow the
reference conventions:

  scene:  "<bop>.bop19"  (test split), "<bop>.pbr"  (train_pbr split),
          "webdataset.<name>"
  object: "<bop>.cad", "<bop>"
"""

from __future__ import annotations

from pathlib import Path

from .. import config
from .bop_scene_dataset import BOPDataset, load_bop_object_dataset
from .web_scene_dataset import WebSceneDataset

BOP_DATASET_NAMES = (
    "lm", "lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv",
)


def make_scene_dataset(
    name: str, load_depth: bool = False, data_dir: Path | None = None
):
    """(datasets_cfg.py:make_scene_dataset:65-195)"""
    if name.startswith("webdataset."):
        wds_name = name.split(".", 1)[1]
        wds_root = Path(data_dir) if data_dir else config.WDS_DS_DIR
        return WebSceneDataset(wds_root / wds_name, load_depth=load_depth)
    data_dir = Path(data_dir or config.BOP_DS_DIR)
    ds_name, _, variant = name.partition(".")
    split = {
        "bop19": "test",
        "test": "test",
        "pbr": "train_pbr",
        "train_real": "train_real",
        "": "test",
    }.get(variant)
    if split is None:
        raise ValueError(f"unknown scene dataset: {name}")
    return BOPDataset(
        data_dir / ds_name, split=split, load_depth=load_depth
    )


def make_object_dataset(name: str, data_dir: Path | None = None):
    """(datasets_cfg.py:make_object_dataset:198-333)"""
    data_dir = Path(data_dir or config.BOP_DS_DIR)
    ds_name = name.split(".")[0]
    models_dir = data_dir / ds_name / "models"
    if not models_dir.exists():
        raise FileNotFoundError(models_dir)
    return load_bop_object_dataset(models_dir)
