"""End-to-end script tests: the example-inference CLI contract and the
synthetic training smoke run (the reference's 'debug config' strategy,
SURVEY.md §4)."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from megapose6d_tpu.data.types import CameraData, ObjectData
from megapose6d_tpu.meshes import make_cube
from megapose6d_tpu.ops import rasterizer


@pytest.fixture(scope="module")
def example_dir(tmp_path_factory):
    """Synthetic 'barbecue sauce'-style example dir."""
    from PIL import Image

    d = tmp_path_factory.mktemp("example") / "cube_example"
    (d / "meshes" / "cube").mkdir(parents=True)
    (d / "inputs").mkdir()

    cube_mm = make_cube(40.0)  # 40mm half extent
    ply = d / "meshes" / "cube" / "cube.ply"
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {cube_mm.n_vertices}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {cube_mm.n_faces}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in cube_mm.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in cube_mm.faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")

    H, W = 120, 160
    K = np.asarray([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1]])
    CameraData(K=K, resolution=(H, W))
    (d / "camera_data.json").write_text(
        CameraData(K=K, resolution=(H, W)).to_json()
    )

    cube_m = make_cube(0.04)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5
    out = rasterizer.render_meshes(
        jnp.asarray(cube_m.vertices)[None],
        jnp.asarray(cube_m.vertex_normals)[None],
        jnp.asarray(cube_m.vertex_colors)[None],
        jnp.asarray(cube_m.faces)[None],
        jnp.ones((1, cube_m.n_faces), bool),
        jnp.asarray(T)[None],
        jnp.asarray(K, jnp.float32)[None],
        (H, W),
        light_ambient=1.0,
        light_point=0.0,
    )
    rgb = (np.asarray(out.rgb[0]) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(d / "image_rgb.png")

    half = 150 * 0.04 / 0.46
    box = [W / 2 - half, H / 2 - half, W / 2 + half, H / 2 + half]
    obj = ObjectData(label="cube", bbox_modal=np.asarray(box))
    (d / "inputs" / "object_data.json").write_text(
        json.dumps([obj.to_json()])
    )
    return d


@pytest.mark.slow
def test_run_inference_on_example(example_dir):
    from megapose6d_tpu.scripts.run_inference_on_example import main

    main(
        [
            str(example_dir),
            "--run-inference",
            "--so3-grid-size", "8",
            "--n-refiner-iterations", "1",
            "--n-pose-hypotheses", "2",
            "--bsz-images", "8",
        ]
    )
    out_path = example_dir / "outputs" / "object_data.json"
    assert out_path.exists()
    data = json.loads(out_path.read_text())
    assert len(data) == 1 and data[0]["label"] == "cube"
    quat, trans = data[0]["TWO"]
    assert len(quat) == 4 and len(trans) == 3
    assert all(np.isfinite(quat)) and all(np.isfinite(trans))
    # Valid unit quaternion (pose is a proper SE(3)).
    np.testing.assert_allclose(np.linalg.norm(quat), 1.0, atol=1e-4)


@pytest.mark.slow
def test_run_training_synthetic_smoke(tmp_path, monkeypatch):
    from megapose6d_tpu.scripts.run_training import main

    monkeypatch.chdir(tmp_path)
    main(
        [
            "config_id=refiner",
            "synthetic=1",
            "n_epochs=1",
            "epoch_size=2",
            "batch_size=2",
            "input_resize=48,64",
            "render_size=32,48",
            "n_rendered_views=1",
            "multiview_type=front_1view",
            "n_points_loss=32",
            "max_faces=128",
            "n_points_mesh=64",
            "save_epoch_interval=1",
        ]
    )
    run_dir = tmp_path / "runs" / "refiner-run"
    assert (run_dir / "config.json").exists()
    log_lines = (run_dir / "log.txt").read_text().strip().splitlines()
    assert len(log_lines) == 1
    log = json.loads(log_lines[0])
    assert np.isfinite(log["loss_total"]) and log["epoch"] == 1
    assert (run_dir / "checkpoints" / "latest.txt").exists()


def test_visualization(example_dir, tmp_path):
    from megapose6d_tpu.inference.types import make_detections
    from megapose6d_tpu.meshes import (
        MeshDataBase,
        RigidObject,
        RigidObjectDataset,
    )
    from megapose6d_tpu.visualization import (
        plot_detections,
        plot_pose_overlay,
        save_image_grid,
    )
    from PIL import Image

    rgb = np.asarray(Image.open(example_dir / "image_rgb.png"))
    det = make_detections(["cube"], np.asarray([[50.0, 40, 100, 90]]))
    plot_detections(rgb, det, tmp_path / "det.png")
    assert (tmp_path / "det.png").exists()

    objs = RigidObjectDataset([RigidObject(label="cube", mesh=make_cube(0.04))])
    db = MeshDataBase.from_object_ds(objs, max_faces=64, n_points=64, n_sym=2).batched(align=32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5
    K = np.asarray([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]], np.float32)
    overlay = plot_pose_overlay(
        rgb, db, ["cube"], T[None], K, tmp_path / "overlay.png"
    )
    assert overlay.shape == rgb.shape
    assert (tmp_path / "overlay.png").exists()

    save_image_grid([rgb, rgb, rgb], tmp_path / "grid.png", n_cols=2)
    assert (tmp_path / "grid.png").exists()
