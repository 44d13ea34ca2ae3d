"""Interactive HTML scene viewer (the meshcat analog,
reference visualization/meshcat_visualizer.py + meshcat_utils.py)."""

import json
import re

import numpy as np

from megapose6d_tpu.data.types import CameraData, ObjectData
from megapose6d_tpu.data.scene_dataset import SceneObservation
from megapose6d_tpu.meshes.io import make_cube
from megapose6d_tpu.visualization.scene_viewer import (
    SceneViewer,
    get_pointcloud,
)


def _scene_json(html: str) -> dict:
    m = re.search(
        r'<script type="application/json" id="scene-data">(.*?)</script>',
        html,
        re.S,
    )
    assert m, "embedded scene payload not found"
    return json.loads(m.group(1))


def test_viewer_writes_standalone_html(tmp_path):
    cube = make_cube(0.05)
    pose = np.eye(4)
    pose[:3, 3] = [0.1, 0.0, 0.5]

    viewer = SceneViewer(title="test scene")
    viewer.add_mesh("gt/cube", cube.vertices, cube.faces, TWO=pose)
    viewer.add_frame("pred", pose, length=0.08)
    viewer.add_bbox("box", [0.1, 0.1, 0.1], T=pose)
    viewer.add_pointcloud("pc", np.random.rand(50, 3).astype(np.float32))
    viewer.add_camera("cam", np.diag([300.0, 300.0, 1.0]), (240, 320))
    out = viewer.write_html(tmp_path / "scene.html")

    html = out.read_text()
    # Self-contained: no external scripts/stylesheets (zero-egress safe).
    assert "<script src" not in html and "http" not in html.split("</title>")[1][:2000]
    scene = _scene_json(html)
    types = [n["type"] for n in scene["nodes"]]
    assert types == ["mesh", "frame", "bbox", "points", "camera"]
    mesh = scene["nodes"][0]
    assert mesh["pose"][0][0] == 1.0 and mesh["pose"][2][3] == 0.5
    # b64 round-trip of vertices
    import base64

    verts = np.frombuffer(
        base64.b64decode(mesh["vertices"]["data"]), np.float32
    ).reshape(-1, 3)
    np.testing.assert_allclose(verts, cube.vertices, atol=1e-6)


def test_get_pointcloud_backprojection():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.zeros((48, 64), np.float32)
    depth[24, 32] = 2.0  # principal point -> (0, 0, 2)
    depth[24, 42] = 1.0  # 10 px right -> x = 0.1
    pts = get_pointcloud(depth, K)
    assert pts.shape == (2, 3)
    by_z = pts[np.argsort(pts[:, 2])]
    np.testing.assert_allclose(by_z[0], [0.1, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(by_z[1], [0.0, 0.0, 2.0], atol=1e-6)


def test_viewer_from_scene_observation(tmp_path):
    cube = make_cube(0.04)
    TWO = np.eye(4, dtype=np.float32)
    TWO[2, 3] = 0.6
    K = np.array(
        [[120.0, 0, 32], [0, 120.0, 24], [0, 0, 1]], np.float32
    )
    depth = np.zeros((48, 64), np.float32)
    depth[10:20, 10:20] = 0.6
    obs = SceneObservation(
        rgb=np.full((48, 64, 3), 128, np.uint8),
        depth=depth,
        camera_data=CameraData(K=K, resolution=(48, 64)),
        object_datas=[ObjectData(label="cube", TWO=TWO)],
    )

    viewer = SceneViewer()
    viewer.add_scene_observation(
        obs, lambda label: (cube.vertices, cube.faces, None)
    )
    viewer.add_pose_estimates(
        __import__(
            "megapose6d_tpu.inference.types", fromlist=["x"]
        ).make_pose_estimates(["cube"], TWO[None]),
        lambda label: (cube.vertices, cube.faces, None),
    )
    out = viewer.write_html(tmp_path / "obs.html")
    scene = _scene_json(out.read_text())
    names = {n["name"] for n in scene["nodes"]}
    assert {"gt/cube", "gt_frame/cube", "depth", "camera",
            "pred/0_cube", "pred_frame/0_cube"} <= names
    pred = next(n for n in scene["nodes"] if n["name"] == "pred/0_cube")
    assert pred["opacity"] < 1.0


def test_viewer_hostile_title_and_names(tmp_path):
    """Quotes/backslashes in titles or node names must not break the
    embedded payload (single-quoted-JS-literal regression)."""
    viewer = SceneViewer(title="bob's \\ <scenes> \"quoted\"")
    cube = make_cube(0.02)
    viewer.add_mesh("it's a </script> cube", cube.vertices, cube.faces)
    out = viewer.write_html(tmp_path / "scene.html")
    scene = _scene_json(out.read_text())
    assert scene["title"] == "bob's \\ <scenes> \"quoted\""
    assert scene["nodes"][0]["name"] == "it's a </script> cube"


def test_pointcloud_color_alignment():
    """Subsampled point clouds keep (point, pixel) pairs aligned."""
    rng = np.random.default_rng(1)
    depth = rng.uniform(0.5, 1.5, (40, 50)).astype(np.float32)
    K = np.asarray([[50.0, 0, 25], [0, 50.0, 20], [0, 0, 1]])
    pts, vs, us = get_pointcloud(depth, K, max_points=100, return_pixels=True)
    assert len(pts) == len(vs) == len(us) == 100
    np.testing.assert_allclose(pts[:, 2], depth[vs, us], rtol=1e-6)
