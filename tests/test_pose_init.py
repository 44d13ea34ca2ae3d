import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from megapose6d_tpu.ops import camera, pose_init


def box_points(ext=(0.1, 0.15, 0.08), n=200, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n, 3)) * np.asarray(ext) / 2
    # Ensure the AABB is tight.
    pts[:8] = np.asarray(
        [
            [sx * ext[0] / 2, sy * ext[1] / 2, sz * ext[2] / 2]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ]
    )
    return pts.astype(np.float32)


def make_K():
    return jnp.asarray([[[600.0, 0, 320], [0, 600, 240], [0, 0, 1]]], jnp.float32)


def test_autodepth_projects_into_box(rng):
    K = make_K()
    pts = jnp.asarray(box_points())[None]
    boxes = jnp.asarray([[250.0, 200.0, 390.0, 280.0]])
    R = jnp.asarray(
        Rotation.random(1, random_state=rng).as_matrix().astype(np.float32)
    )
    TCO = pose_init.tco_init_from_boxes_autodepth_with_R(boxes, pts, K, R)
    assert np.asarray(TCO[0, 2, 3]) > 0.05
    uv = np.asarray(camera.project_points(pts, K, TCO))[0]
    ext = uv.max(0) - uv.min(0)
    box_wh = np.asarray([390.0 - 250.0, 280.0 - 200.0])
    # Projected extent should roughly match the box (x and y are averaged).
    ratio = ext / box_wh
    assert 0.6 < ratio.mean() < 1.6, ratio
    center = (uv.max(0) + uv.min(0)) / 2
    np.testing.assert_allclose(center, [320.0, 240.0], atol=120)


def test_zup_autodepth_matches_R_variant():
    K = make_K()
    pts = jnp.asarray(box_points())[None]
    boxes = jnp.asarray([[250.0, 200.0, 390.0, 280.0]])
    zup = pose_init.tco_init_from_boxes_zup_autodepth(boxes, pts, K)
    R = pose_init._ZUP_R[None]
    ref = pose_init.tco_init_from_boxes_autodepth_with_R(boxes, pts, K, R)
    np.testing.assert_allclose(zup, ref, atol=1e-6)


def test_pose_update_identity():
    K = make_K()
    TCO = jnp.eye(4)[None].at[0, 2, 3].set(1.0)
    tCR = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])  # vz=1 => depth unchanged
    out = pose_init.pose_update_with_reference_point(
        TCO, K, v, jnp.eye(3)[None], tCR
    )
    np.testing.assert_allclose(out, TCO, atol=1e-6)


def test_pose_update_vz_scales_depth():
    K = make_K()
    TCO = jnp.eye(4)[None].at[0, 2, 3].set(1.0)
    tCR = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.5]])
    out = pose_init.pose_update_with_reference_point(
        TCO, K, v, jnp.eye(3)[None], tCR
    )
    np.testing.assert_allclose(out[0, 2, 3], 1.5, atol=1e-6)
