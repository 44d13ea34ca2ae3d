"""Named-dataset registry surface (reference datasets_cfg.py:65-333)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from megapose6d_tpu.data import datasets_cfg
from megapose6d_tpu.meshes import make_cube, save_ply


def _write_bop_scene(ds_dir: Path, split: str, scene_id=1, n_views=3):
    scene = ds_dir / split / f"{scene_id:06d}"
    (scene / "rgb").mkdir(parents=True)
    from PIL import Image

    cam, gt, gt_info = {}, {}, {}
    for v in range(n_views):
        Image.new("RGB", (32, 24)).save(scene / "rgb" / f"{v:06d}.png")
        cam[str(v)] = {
            "cam_K": [100.0, 0, 16, 0, 100.0, 12, 0, 0, 1],
            "depth_scale": 1.0,
        }
        gt[str(v)] = [
            {
                "obj_id": 1,
                "cam_R_m2c": list(np.eye(3).reshape(-1)),
                "cam_t_m2c": [0, 0, 400.0],
            }
        ]
        gt_info[str(v)] = [
            {
                "bbox_visib": [2, 2, 10, 10],
                "bbox_obj": [2, 2, 10, 10],
                "visib_fract": 1.0,
            }
        ]
    (scene / "scene_camera.json").write_text(json.dumps(cam))
    (scene / "scene_gt.json").write_text(json.dumps(gt))
    (scene / "scene_gt_info.json").write_text(json.dumps(gt_info))


def _write_bop_models(ds_dir: Path, models="models", n=2):
    mdir = ds_dir / models
    mdir.mkdir(parents=True, exist_ok=True)
    info = {}
    for i in range(1, n + 1):
        save_ply(make_cube(0.02), mdir / f"obj_{i:06d}.ply")
        info[str(i)] = {"diameter": 40.0}
    (mdir / "models_info.json").write_text(json.dumps(info))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("megapose_data")
    bop = root / "bop_datasets"
    # ycbv with test split + bop19 targets covering 2 of 3 views
    ycbv = bop / "ycbv"
    _write_bop_scene(ycbv, "test")
    _write_bop_models(ycbv)
    (ycbv / "test_targets_bop19.json").write_text(json.dumps(
        [
            {"im_id": 0, "inst_count": 1, "obj_id": 1, "scene_id": 1},
            {"im_id": 2, "inst_count": 1, "obj_id": 1, "scene_id": 1},
        ]
    ))
    # tless with primesense splits + models_cad
    tless = bop / "tless"
    _write_bop_scene(tless, "test_primesense")
    _write_bop_scene(tless, "train_primesense")
    _write_bop_models(tless, "models_cad")
    (tless / "test_targets_bop19.json").write_text(json.dumps(
        [{"im_id": 1, "inst_count": 1, "obj_id": 1, "scene_id": 1}]
    ))
    # ycbv pbr split
    _write_bop_scene(ycbv, "train_pbr")
    # GSO tree
    for name in ("alpha", "beta", "gamma"):
        mdir = root / "gso" / "models_orig" / name / "meshes"
        mdir.mkdir(parents=True)
        from megapose6d_tpu.meshes.io import save_ply as _sp  # noqa
        # GSO uses OBJ; write a minimal OBJ cube
        (mdir / "model.obj").write_text(
            "v 0 0 0\nv 0.01 0 0\nv 0.01 0.01 0\nv 0 0.01 0\n"
            "f 1 2 3\nf 1 3 4\n"
        )
    # ShapeNet tree
    for synset, model in (("02691156", "m1"), ("02691156", "m2"),
                          ("03001627", "m3")):
        mdir = root / "shapenetcorev2" / synset / model / "models"
        mdir.mkdir(parents=True, exist_ok=True)
        (mdir / "model_normalized.obj").write_text(
            "v 0 0 0\nv 0.01 0 0\nv 0.01 0.01 0\nf 1 2 3\n"
        )
    return root


def test_bop19_split_and_targets(data_root):
    ds = datasets_cfg.make_scene_dataset(
        "ycbv.bop19", data_dir=data_root / "bop_datasets"
    )
    # targets restrict 3 views -> 2
    assert len(ds) == 2
    obs = ds[0]
    assert obs.object_datas[0].label == "ycbv-000001"


def test_bop19_primesense_split(data_root):
    ds = datasets_cfg.make_scene_dataset(
        "tless.bop19", data_dir=data_root / "bop_datasets"
    )
    assert len(ds) == 1
    assert ds[0].object_datas[0].label == "tless-000001"


def test_extra_splits(data_root):
    ds = datasets_cfg.make_scene_dataset(
        "tless.primesense.train", data_dir=data_root / "bop_datasets"
    )
    assert len(ds) == 3
    ds = datasets_cfg.make_scene_dataset(
        "ycbv.pbr", data_dir=data_root / "bop_datasets"
    )
    assert len(ds) == 3
    assert ds[0].object_datas[0].label == "ycbv-000001"


def test_n_frames_cap(data_root):
    ds = datasets_cfg.make_scene_dataset(
        "ycbv.pbr", data_dir=data_root / "bop_datasets", n_frames=1
    )
    assert len(ds) == 1


def test_object_datasets_bop(data_root):
    bop = data_root / "bop_datasets"
    ds = datasets_cfg.make_object_dataset("ycbv", data_dir=bop)
    assert sorted(o.label for o in ds.objects) == [
        "ycbv-000001", "ycbv-000002",
    ]
    # .panda3d aliases the same models (no conversion step needed).
    ds2 = datasets_cfg.make_object_dataset("ycbv.panda3d", data_dir=bop)
    assert [o.label for o in ds2.objects] == [o.label for o in ds.objects]
    cad = datasets_cfg.make_object_dataset("tless.cad", data_dir=bop)
    assert cad.objects[0].label == "tless-000001"


def test_gso_nobjects(data_root):
    ds = datasets_cfg.make_object_dataset("gso.orig", data_dir=data_root)
    assert len(ds.objects) == 3
    ds2 = datasets_cfg.make_object_dataset(
        "gso.nobjects=2.orig", data_dir=data_root
    )
    assert len(ds2.objects) == 2
    assert all(o.label.startswith("gso_") for o in ds2.objects)


def test_shapenet_names(data_root):
    ds = datasets_cfg.make_object_dataset("shapenet.orig", data_dir=data_root)
    assert len(ds.objects) == 3
    assert all(o.label.startswith("shapenet_") for o in ds.objects)


def test_unknown_names_raise(data_root):
    # Unregistered names fall back to generic BOP trees, which must fail
    # loudly when the tree does not exist.
    with pytest.raises((ValueError, AssertionError, FileNotFoundError)):
        datasets_cfg.make_scene_dataset("nope.bop19")
    with pytest.raises(ValueError):
        datasets_cfg.make_object_dataset("nope_objects")
    with pytest.raises(ValueError):
        datasets_cfg.make_scene_dataset("ycbv.not_a_variant")


def test_get_obj_ds_info():
    assert datasets_cfg.get_obj_ds_info("ycbv.bop19") == ("ycbv", "ycbv")
    assert datasets_cfg.get_obj_ds_info("tless.bop19") == (
        "tless.cad", "tless.cad",
    )
