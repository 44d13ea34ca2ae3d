import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from megapose6d_tpu.data.bop_scene_dataset import (
    BOPDataset,
    load_bop_object_dataset,
)
from megapose6d_tpu.data.tensor_collection import PandasTensorCollection
from megapose6d_tpu.evaluation import (
    ModelNetErrorMeter,
    compute_errors,
    convert_results_to_bop,
    load_bop_results,
    one_to_one_matching,
    shard_frames,
)
from megapose6d_tpu.meshes import MeshDataBase, make_cube


def write_synthetic_bop(root: Path, n_scenes=2, n_views=3):
    """Minimal BOP-format dataset with one cube object."""
    from PIL import Image

    models = root / "models"
    models.mkdir(parents=True)
    cube = make_cube(0.05 * 1000)  # mm
    ply = models / "obj_000001.ply"
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {cube.n_vertices}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {cube.n_faces}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in cube.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in cube.faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
    (models / "models_info.json").write_text(
        json.dumps(
            {
                "1": {
                    "diameter": 173.2,
                    "symmetries_discrete": [
                        np.eye(4).reshape(-1).tolist()
                    ],
                }
            }
        )
    )

    K = [300.0, 0.0, 64.0, 0.0, 300.0, 48.0, 0.0, 0.0, 1.0]
    for s in range(n_scenes):
        sdir = root / "test" / f"{s:06d}"
        (sdir / "rgb").mkdir(parents=True)
        (sdir / "mask_visib").mkdir()
        (sdir / "depth").mkdir()
        cam, gt, gt_info = {}, {}, {}
        for v in range(n_views):
            cam[str(v)] = {"cam_K": K, "depth_scale": 0.1}
            gt[str(v)] = [
                {
                    "obj_id": 1,
                    "cam_R_m2c": np.eye(3).reshape(-1).tolist(),
                    "cam_t_m2c": [10.0, -5.0, 500.0],  # mm
                }
            ]
            gt_info[str(v)] = [
                {
                    "bbox_visib": [50, 30, 30, 30],
                    "bbox_obj": [50, 30, 30, 30],
                    "visib_fract": 0.9,
                }
            ]
            img = np.zeros((96, 128, 3), np.uint8)
            img[30:60, 50:80] = 128
            Image.fromarray(img).save(sdir / "rgb" / f"{v:06d}.png")
            mask = np.zeros((96, 128), np.uint8)
            mask[30:60, 50:80] = 255
            Image.fromarray(mask).save(
                sdir / "mask_visib" / f"{v:06d}_000000.png"
            )
            depth = np.full((96, 128), 5000, np.uint16)  # 0.1 scale -> 0.5m
            Image.fromarray(depth).save(sdir / "depth" / f"{v:06d}.png")
        (sdir / "scene_camera.json").write_text(json.dumps(cam))
        (sdir / "scene_gt.json").write_text(json.dumps(gt))
        (sdir / "scene_gt_info.json").write_text(json.dumps(gt_info))
    return root


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    return write_synthetic_bop(tmp_path_factory.mktemp("bop") / "cubeds")


def test_bop_dataset_reader(bop_root):
    ds = BOPDataset(bop_root, split="test", load_depth=True)
    assert len(ds) == 6
    obs = ds[0]
    assert obs.rgb.shape == (96, 128, 3)
    assert obs.depth is not None
    np.testing.assert_allclose(obs.depth[0, 0], 0.5, atol=1e-6)
    assert obs.camera_data.K[0, 0] == 300.0
    assert len(obs.object_datas) == 1
    obj = obs.object_datas[0]
    assert obj.label == "obj_000001"
    np.testing.assert_allclose(obj.TWO[:3, 3], [0.01, -0.005, 0.5], atol=1e-9)
    np.testing.assert_allclose(obj.bbox_modal, [50, 30, 80, 60])
    assert (obs.segmentation > 0).sum() == 900


def test_bop_object_dataset(bop_root):
    objs = load_bop_object_dataset(bop_root / "models")
    assert objs.labels == ["obj_000001"]
    obj = objs.get_object_by_label("obj_000001")
    mesh = obj.load()
    # mm -> m scaling applied.
    assert abs(np.abs(mesh.vertices).max() - 0.05) < 1e-6
    assert len(obj.symmetries_discrete) == 1


def test_bop_csv_roundtrip(tmp_path):
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    poses[0, :3, 3] = [0.01, 0.02, 0.5]
    infos = pd.DataFrame(
        {
            "label": ["obj_000004", "obj_000011"],
            "scene_id": [3, 3],
            "view_id": [7, 8],
            "pose_score": [0.9, 0.4],
            "time": [0.12, 0.13],
        }
    )
    preds = PandasTensorCollection(infos, poses=poses)
    csv = convert_results_to_bop(preds, tmp_path / "out.csv")
    rows = load_bop_results(csv)
    assert rows[0]["obj_id"] == 4 and rows[1]["obj_id"] == 11
    np.testing.assert_allclose(rows[0]["t"], [10.0, 20.0, 500.0], atol=1e-5)
    np.testing.assert_allclose(rows[0]["R"], np.eye(3), atol=1e-7)
    assert rows[0]["score"] == 0.9
    header = (tmp_path / "out.csv").read_text().splitlines()[0]
    assert header == "scene_id,im_id,obj_id,score,R,t,time"


def test_compute_errors_and_meter(bop_root):
    objs = load_bop_object_dataset(bop_root / "models")
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=64, n_points=200, n_sym=4
    ).batched(align=32)

    TCO_gt = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    TCO_gt[:, 2, 3] = 0.5
    TCO_pred = TCO_gt.copy()
    TCO_pred[1, 0, 3] += 0.003  # 3 mm error
    TCO_pred[2, 0, 3] += 0.2  # 20 cm error
    K = np.tile(
        np.asarray([[300.0, 0, 64], [0, 300, 48], [0, 0, 1]], np.float32),
        (3, 1, 1),
    )
    pts = np.asarray(mesh_db.points)[np.zeros(3, int)]
    errs = compute_errors(TCO_pred, TCO_gt, pts, K)
    np.testing.assert_allclose(errs["add"], [0, 0.003, 0.2], atol=1e-5)
    assert errs["adds"][1] <= errs["add"][1] + 1e-6

    meter = ModelNetErrorMeter(mesh_db, sample_n_points=100)
    infos = pd.DataFrame(
        {"label": ["obj_000001"] * 3, "view_id": [0, 1, 2]}
    )
    gt = PandasTensorCollection(infos.copy(), poses=TCO_gt, K=K)
    pred = PandasTensorCollection(infos.copy(), poses=TCO_pred)
    meter.add(pred, gt)
    s = meter.summary()
    assert s["n"] == 3
    # diameter = 0.1*sqrt(3) m -> 0.1d = 17.3 mm: errors 0 & 3 mm pass.
    assert abs(s["ADD_0.1d"] - 2 / 3) < 1e-6
    assert abs(s["5deg_5cm"] - 2 / 3) < 1e-6


def test_shard_frames():
    shards = [shard_frames(10, r, 3) for r in range(3)]
    assert sum(len(s) for s in shards) == 10
    assert set(np.concatenate(shards).tolist()) == set(range(10))


def test_one_to_one_matching():
    pred = pd.DataFrame({"label": ["a", "b"], "scene_id": [0, 0], "view_id": [1, 1]})
    gt = pd.DataFrame({"label": ["b", "a"], "scene_id": [0, 0], "view_id": [1, 1]})
    m = one_to_one_matching(pred, gt)
    assert len(m) == 2
    assert m.iloc[0]["label"] == "b" and m.iloc[0]["pred_id"] == 1


def test_match_predictions_detector_order_and_misses():
    """Detector-driven eval: detection-order instance_ids + missed
    objects must fall back to BOP-style greedy matching, not crash."""
    from megapose6d_tpu.evaluation import match_predictions

    # Exact path: GT-driven detections (aligned instance_ids).
    gt = pd.DataFrame(
        {"label": ["a", "b"], "instance_id": [0, 1],
         "scene_id": [0, 0], "view_id": [1, 1]}
    )
    pred = pd.DataFrame(
        {"label": ["b", "a"], "instance_id": [1, 0],
         "scene_id": [0, 0], "view_id": [1, 1]}
    )
    p_ids, g_ids, missed = match_predictions(pred, gt)
    assert len(missed) == 0
    assert list(pred["label"].iloc[p_ids]) == list(gt["label"].iloc[g_ids])

    # Greedy path: instance ids in detection order (label 'a' has id 1 in
    # pred but 0 in gt), and 'b' is missed entirely.
    pred2 = pd.DataFrame(
        {"label": ["c", "a"], "instance_id": [0, 1],
         "scene_id": [0, 0], "view_id": [1, 1],
         "score": [0.9, 0.8]}
    )
    gt2 = pd.DataFrame(
        {"label": ["a", "b", "c"], "instance_id": [0, 1, 2],
         "scene_id": [0, 0, 0], "view_id": [1, 1, 1]}
    )
    p_ids, g_ids, missed = match_predictions(pred2, gt2)
    assert list(pred2["label"].iloc[p_ids]) == list(gt2["label"].iloc[g_ids])
    assert len(p_ids) == 2
    assert list(gt2["label"].iloc[missed]) == ["b"]

    # Same-label multi-instance: two preds, three gts -> best-score pred
    # pairs first, one miss.
    pred3 = pd.DataFrame(
        {"label": ["x", "x"], "instance_id": [0, 1],
         "scene_id": [0, 0], "view_id": [1, 1], "score": [0.5, 0.9]}
    )
    gt3 = pd.DataFrame(
        {"label": ["x", "x", "x"], "instance_id": [5, 6, 7],
         "scene_id": [0, 0, 0], "view_id": [1, 1, 1]}
    )
    p_ids, g_ids, missed = match_predictions(pred3, gt3)
    assert len(p_ids) == 2 and len(missed) == 1
    assert p_ids[0] == 1  # higher score claims the first gt


def test_mssd_mspd_and_bop_score_meter(bop_root):
    from megapose6d_tpu.evaluation import BOPScoreMeter, compute_mssd_mspd

    objs = load_bop_object_dataset(bop_root / "models")
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=64, n_points=200, n_sym=4
    ).batched(align=32)

    TCO_gt = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    TCO_gt[:, 2, 3] = 0.5
    TCO_pred = TCO_gt.copy()
    TCO_pred[1, 0, 3] += 0.004  # 4 mm
    TCO_pred[2, 0, 3] += 0.3  # 30 cm
    K = np.tile(
        np.asarray([[300.0, 0, 64], [0, 300, 48], [0, 0, 1]], np.float32),
        (3, 1, 1),
    )
    meshes = mesh_db.select(np.zeros(3, int))
    pts = np.asarray(meshes.points)[:, :200]
    errs = compute_mssd_mspd(
        TCO_pred, TCO_gt, pts, K,
        np.asarray(meshes.symmetries), np.asarray(meshes.sym_valid),
    )
    # Exact pose -> 0 error; 4mm shift -> mssd ~4mm (x-shift, max over pts).
    np.testing.assert_allclose(errs["mssd"][0], 0.0, atol=1e-5)
    np.testing.assert_allclose(errs["mssd"][1], 0.004, atol=1e-4)
    assert errs["mssd"][2] > 0.2
    # MSPD in pixels: 4mm at z=0.5, f=300 -> ~2.4 px.
    np.testing.assert_allclose(errs["mspd"][1], 300 * 0.004 / 0.5, rtol=0.2)

    meter = BOPScoreMeter(mesh_db, image_width=128)
    infos = pd.DataFrame({"label": ["obj_000001"] * 3, "view_id": [0, 1, 2]})
    gt = PandasTensorCollection(infos.copy(), poses=TCO_gt, K=K)
    pred = PandasTensorCollection(infos.copy(), poses=TCO_pred)
    meter.add(pred, gt)
    s = meter.summary()
    assert s["n"] == 3
    # Perfect + 4mm pass all/most thresholds; 30cm fails all.
    assert 0.5 < s["AR_MSSD"] < 0.75
    assert s["mssd_median"] < 0.005


def test_mssd_respects_symmetries(bop_root):
    """With a z-continuous symmetry declared, a pure z-rotation must give
    ~zero MSSD."""
    from megapose6d_tpu.evaluation import compute_mssd_mspd
    from megapose6d_tpu.meshes import RigidObject, RigidObjectDataset, make_uv_sphere
    from megapose6d_tpu.ops.symmetries import ContinuousSymmetry

    objs = RigidObjectDataset([
        RigidObject(
            label="cyl", mesh=make_uv_sphere(0.04, 8, 8),
            symmetries_continuous=[
                ContinuousSymmetry(np.zeros(3), np.array([0, 0, 1]))
            ],
        )
    ])
    db = MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=64, n_sym=16
    ).batched(align=32)
    meshes = db.select(np.zeros(1, int))
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[2, 3] = 0.5
    ang = 2 * np.pi / 8  # exactly a sampled symmetry angle
    c, s = np.cos(ang), np.sin(ang)
    T_pred = T_gt.copy()
    T_pred[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    K = np.asarray([[[300.0, 0, 64], [0, 300, 48], [0, 0, 1]]], np.float32)
    errs = compute_mssd_mspd(
        T_pred[None], T_gt[None], np.asarray(meshes.points)[:, :64], K,
        np.asarray(meshes.symmetries), np.asarray(meshes.sym_valid),
    )
    assert errs["mssd"][0] < 1e-4, errs["mssd"]


@pytest.mark.slow
def test_vsd(bop_root):
    import jax.numpy as jnp

    from megapose6d_tpu.evaluation import compute_vsd, vsd_recall
    from megapose6d_tpu.ops import rasterizer

    objs = load_bop_object_dataset(bop_root / "models")
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=64, n_points=64, n_sym=2
    ).batched(align=32)
    meshes1 = mesh_db.select(np.zeros(1, int))
    K = np.asarray([[200.0, 0, 64], [0, 200.0, 48], [0, 0, 1]], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[2, 3] = 0.5
    # Measured depth = render of the GT pose (plus background plane).
    out = rasterizer.render_meshes(
        meshes1.vertices, meshes1.normals, meshes1.colors, meshes1.faces,
        meshes1.face_valid, jnp.asarray(T_gt)[None], jnp.asarray(K)[None],
        (96, 128),
    )
    depth_meas = np.array(out.depth[0])  # writable copy
    depth_meas[depth_meas == 0] = 1.5  # background wall

    diam = np.asarray(mesh_db.diameters)[:1]
    # Case 1: exact pose -> e_VSD = 0 for all taus.
    e = compute_vsd(depth_meas, T_gt[None], T_gt[None], K, meshes1, diam)
    np.testing.assert_allclose(e, 0.0, atol=1e-6)
    assert vsd_recall(e) == 1.0

    # Case 2: 20 cm off -> high error, zero recall.
    T_bad = T_gt.copy()
    T_bad[0, 3] += 0.2
    meshes2 = mesh_db.select(np.zeros(2, int))
    e2 = compute_vsd(
        depth_meas,
        np.stack([T_gt, T_bad]),
        np.stack([T_gt, T_gt]),
        K, meshes2, np.repeat(diam, 2),
    )
    assert e2[0].max() < 1e-5
    assert e2[1].min() > 0.5
    # Case 3: small depth shift below tau threshold passes large taus.
    T_near = T_gt.copy()
    T_near[2, 3] += 0.01  # 10 mm (diameter ~173 mm; tau range 8.7-86 mm)
    e3 = compute_vsd(
        depth_meas, T_near[None], T_gt[None], K, meshes1, diam
    )
    assert e3[0, 0] > 0.5  # tau = 8.7 mm < 10 mm shift -> mostly bad
    assert e3[0, -1] < 0.3  # tau = 86 mm >> shift -> mostly fine
