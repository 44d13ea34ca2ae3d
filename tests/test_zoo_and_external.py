import dataclasses

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from megapose6d_tpu.data import ObservationTensor
from megapose6d_tpu.data.tensor_collection import PandasTensorCollection
from megapose6d_tpu.inference import NAMED_MODELS, load_named_model
from megapose6d_tpu.meshes import (
    RigidObject,
    RigidObjectDataset,
    make_cube,
    make_uv_sphere,
)
from megapose6d_tpu.meshes.mesh_db import (
    MeshDataBase,
    load_batched_meshes,
    save_batched_meshes,
)
from megapose6d_tpu.ops import rasterizer

IMG = (72, 96)
K = np.asarray([[120.0, 0, 48], [0, 120.0, 36], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def objects():
    return RigidObjectDataset(
        [RigidObject(label="cube", mesh=make_cube(0.04))]
    )


def make_obs(objects, with_depth=False):
    db = MeshDataBase.from_object_ds(
        objects, max_faces=64, n_points=64, n_sym=2
    ).batched(align=32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5
    m = db.select(jnp.zeros((1,), jnp.int32))
    out = rasterizer.render_meshes(
        m.vertices, m.normals, m.colors, m.faces, m.face_valid,
        jnp.asarray(T)[None], jnp.asarray(K)[None], IMG,
        light_ambient=1.0, light_point=0.0,
    )
    depth = np.asarray(out.depth[0]) if with_depth else None
    return (
        ObservationTensor.from_numpy(
            (np.asarray(out.rgb[0]) * 255).astype(np.uint8), depth, K
        ),
        T,
    )


def test_named_models_registry():
    assert set(NAMED_MODELS) == {
        "megapose-1.0-RGB",
        "megapose-1.0-RGBD",
        "megapose-1.0-RGB-multi-hypothesis",
        "megapose-1.0-RGB-multi-hypothesis-icp",
    }
    assert NAMED_MODELS["megapose-1.0-RGBD"]["requires_depth"]
    assert (
        NAMED_MODELS["megapose-1.0-RGB-multi-hypothesis"][
            "inference_parameters"
        ]["n_pose_hypotheses"]
        == 5
    )


@pytest.mark.slow
def test_load_named_model_and_external_init(objects):
    est = load_named_model(
        "megapose-1.0-RGB",
        objects,
        max_faces=64,
        compute_dtype="float32",
        SO3_grid_size=8,
        n_refiner_iterations=1,
        bsz_images=8,
        bsz_objects=4,
        max_detections=2,
    )
    obs, T_gt = make_obs(objects)
    # External-init path (ModelNet protocol): provide TCO_init, skip coarse.
    est.cfg = dataclasses.replace(est.cfg, coarse_estimation_type="external")
    detections = PandasTensorCollection(
        pd.DataFrame(
            {"label": ["cube"], "score": [1.0], "batch_im_id": [0],
             "instance_id": [0]}
        ),
        bboxes=np.asarray([[30.0, 20, 70, 55]], np.float32),
        TCO_init=T_gt[None],
    )
    data, extra = est.run_inference_pipeline(obs, detections)
    assert data.poses.shape == (1, 4, 4)
    assert np.isfinite(data.poses).all()
    assert "pose_score" in data.infos.columns
    assert extra["refiner"]["trajectory"].shape[0] == 1


@pytest.mark.slow
def test_rgbd_named_model_with_icp(objects):
    est = load_named_model(
        "megapose-1.0-RGB-multi-hypothesis-icp",
        objects,
        max_faces=64,
        compute_dtype="float32",
        SO3_grid_size=4,
        n_refiner_iterations=1,
        n_pose_hypotheses=2,
        bsz_images=4,
        bsz_objects=4,
        max_detections=1,
    )
    assert est.depth_refiner is not None
    assert est.cfg.run_depth_refiner
    obs, T_gt = make_obs(objects, with_depth=True)
    detections = PandasTensorCollection(
        pd.DataFrame(
            {"label": ["cube"], "score": [1.0], "batch_im_id": [0],
             "instance_id": [0]}
        ),
        bboxes=np.asarray([[30.0, 20, 70, 55]], np.float32),
    )
    data, extra = est.run_inference_pipeline(obs, detections)
    assert "depth_refiner" in extra
    assert np.isfinite(data.poses).all()
    assert "depth_refiner" in est.timing_


def test_mesh_db_cache_roundtrip(objects, tmp_path):
    db = MeshDataBase.from_object_ds(
        objects, max_faces=64, n_points=64, n_sym=4
    ).batched(align=32)
    save_batched_meshes(tmp_path / "db.npz", db)
    loaded = load_batched_meshes(tmp_path / "db.npz")
    assert loaded.labels == db.labels
    np.testing.assert_allclose(loaded.vertices, db.vertices)
    np.testing.assert_allclose(loaded.diameters, db.diameters)
    np.testing.assert_array_equal(loaded.faces, db.faces)


def test_object_dataset_loaders(tmp_path):
    from megapose6d_tpu.data.object_datasets import (
        make_directory_object_dataset,
        make_gso_object_dataset,
    )

    # GSO-style layout.
    for name in ("apple", "banana"):
        d = tmp_path / "gso" / name / "meshes"
        d.mkdir(parents=True)
        cube = make_cube(0.03)
        with open(d / "model.obj", "w") as f:
            for v in cube.vertices:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for face in cube.faces:
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    ds = make_gso_object_dataset(tmp_path / "gso")
    assert ds.labels == ["gso_apple", "gso_banana"]
    ds1 = make_gso_object_dataset(tmp_path / "gso", n_objects=1)
    assert len(ds1) == 1
    mesh = ds.objects[0].load()
    assert mesh.n_vertices == 24

    # Flat dir.
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "thing.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    )
    ds2 = make_directory_object_dataset(flat, mesh_units="m")
    assert ds2.labels == ["thing"]


def test_inference_utils_helpers():
    import pandas as pd

    from megapose6d_tpu.data.types import CameraData
    from megapose6d_tpu.inference.types import (
        add_instance_id,
        filter_detections,
        make_cameras,
        make_detections,
    )

    det = make_detections(
        ["a", "b", "a"],
        np.asarray([[0, 0, 1, 1], [0, 0, 2, 2], [0, 0, 3, 3]], np.float32),
        scores=np.asarray([0.9, 0.8, 0.95]),
    )
    only_a = filter_detections(det, labels=["a"])
    assert list(only_a.infos["label"]) == ["a", "a"]
    oipc = filter_detections(det, one_instance_per_class=True)
    assert len(oipc) == 2
    assert set(oipc.infos["label"]) == {"a", "b"}
    # The higher-scoring 'a' (0.95) survives.
    a_row = oipc.infos[oipc.infos["label"] == "a"].iloc[0]
    assert abs(a_row["score"] - 0.95) < 1e-6

    det2 = add_instance_id(det)
    a_ids = det2.infos[det2.infos["label"] == "a"]["instance_id"].tolist()
    assert sorted(a_ids) == [0, 1]

    cams = make_cameras(
        [CameraData(K=np.eye(3) * 100, resolution=(48, 64))] * 2
    )
    assert cams.K.shape == (2, 3, 3)


def test_compute_masks():
    import jax.numpy as jnp

    from megapose6d_tpu.inference.depth_refiner import compute_masks

    rend = jnp.asarray([[0.0, 0.5], [0.5, 0.5]])
    meas = jnp.asarray([[0.5, 0.5], [0.0, 0.9]])
    simple = np.asarray(compute_masks("simple", rend, meas))
    assert simple.tolist() == [[False, True], [True, True]]
    thr = np.asarray(compute_masks("threshold", rend, meas, 0.1))
    assert thr.tolist() == [[False, True], [False, False]]
