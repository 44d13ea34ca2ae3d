import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from megapose6d_tpu.ops import camera, se3


def make_K(fx=600.0, fy=600.0, cx=320.0, cy=240.0):
    return jnp.asarray([[[fx, 0, cx], [0, fy, cy], [0, 0, 1]]], jnp.float32)


def test_project_points_manual():
    K = make_K()
    TCO = jnp.eye(4)[None]
    pts = jnp.asarray([[[0.0, 0.0, 1.0], [0.1, -0.2, 2.0]]])
    uv = camera.project_points(pts, K, TCO)
    np.testing.assert_allclose(
        uv[0], [[320, 240], [320 + 600 * 0.05, 240 - 600 * 0.1]], atol=1e-4
    )


def test_project_points_robust_clamps():
    K = make_K()
    TCO = jnp.eye(4)[None]
    pts = jnp.asarray([[[0.05, 0.0, -1.0]]])  # behind camera
    uv = camera.project_points_robust(pts, K, TCO, z_min=0.1)
    # Reference semantics (camera_geometry.py:40-53): numerator keeps the
    # real z, only the divisor is clamped: u = (fx*x + cx*z) / z_min.
    np.testing.assert_allclose(
        uv[0, 0], [(600 * 0.05 - 320) / 0.1, -240 / 0.1], atol=1e-2
    )
    assert np.isfinite(np.asarray(uv)).all()


def test_boxes_from_uv():
    uv = jnp.asarray([[[1.0, 7.0], [5.0, 2.0], [3.0, 4.0]]])
    np.testing.assert_allclose(
        camera.boxes_from_uv(uv)[0], [1, 2, 5, 7], atol=1e-6
    )
    valid = jnp.asarray([[True, False, True]])
    np.testing.assert_allclose(
        camera.masked_boxes_from_uv(uv, valid)[0], [1, 4, 3, 7], atol=1e-6
    )


def test_get_K_crop_resize_pixel_mapping(rng):
    """After cropping box b and resizing to (H2, W2), a 3D point's projection
    must obey u_new = s_x (u_old - box_cx) + (W2-1)/2 (ref formula,
    camera_geometry.py:67-126)."""
    K = make_K()
    box = jnp.asarray([[100.0, 50.0, 400.0, 250.0]])
    out_hw = (120, 180)
    newK = camera.get_K_crop_resize(K, box, (480, 640), out_hw)
    pts = jnp.asarray(rng.randn(1, 10, 3).astype(np.float32))
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]) + 1.0)
    TCO = jnp.eye(4)[None]
    uv_old = np.asarray(camera.project_points(pts, K, TCO))[0]
    uv_new = np.asarray(camera.project_points(pts, newK, TCO))[0]
    sx = 180 / 300.0
    sy = 120 / 200.0
    expected_u = sx * (uv_old[:, 0] - 250.0) + (180 - 1) / 2
    expected_v = sy * (uv_old[:, 1] - 150.0) + (120 - 1) / 2
    np.testing.assert_allclose(uv_new[:, 0], expected_u, atol=1e-3)
    np.testing.assert_allclose(uv_new[:, 1], expected_v, atol=1e-3)


def test_look_at_R(rng):
    eye = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    target = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    up = jnp.asarray([0.0, -1.0, 0.0])[None].repeat(16, 0)
    R = np.asarray(camera.look_at_R(eye, target, up))
    # Orthonormal, det +1.
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    # Forward (3rd column) points at the target.
    fwd = np.array(target) - np.array(eye)
    fwd = fwd / np.linalg.norm(fwd, axis=-1, keepdims=True)
    np.testing.assert_allclose(R[..., 2], fwd, atol=1e-5)
    # Camera y column points "down": non-negative dot with -up_hint.
    assert (R[..., 1] @ np.asarray([0.0, 1.0, 0.0]) >= -1e-6).all()
