import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

import jax
from megapose6d_tpu.ops import se3


def random_se3(rng, b=()):
    R = Rotation.random(int(np.prod(b)) if b else 1, random_state=rng)
    Rm = R.as_matrix().reshape(b + (3, 3))
    t = rng.randn(*b, 3)
    return np.asarray(
        se3.make_se3(jnp.asarray(Rm, jnp.float32), jnp.asarray(t, jnp.float32))
    )


def test_transform_pts_matches_manual(rng):
    T = random_se3(rng, (5,))
    pts = rng.randn(5, 7, 3).astype(np.float32)
    out = se3.transform_pts(jnp.asarray(T), jnp.asarray(pts))
    expected = np.einsum("bij,bnj->bni", T[:, :3, :3], pts) + T[:, None, :3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_transform_pts_symmetry_axis(rng):
    # T with an extra set axis: [B, S, 4, 4] applied to [B, N, 3].
    T = random_se3(rng, (4, 3))
    pts = rng.randn(4, 6, 3).astype(np.float32)
    out = se3.transform_pts(jnp.asarray(T), jnp.asarray(pts))
    assert out.shape == (4, 3, 6, 3)
    expected = np.einsum("bsij,bnj->bsni", T[..., :3, :3], pts) + T[
        :, :, None, :3, 3
    ]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_invert_se3(rng):
    T = jnp.asarray(random_se3(rng, (8,)))
    eye = se3.invert_se3(T) @ T
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_ortho6d_recovers_rotation(rng):
    R = Rotation.random(10, random_state=rng).as_matrix().astype(np.float32)
    poses6d = np.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)
    out = se3.rotmat_from_ortho6d(jnp.asarray(poses6d))
    np.testing.assert_allclose(out, R, atol=1e-5)


def test_ortho6d_is_rotation(rng):
    x = rng.randn(20, 6).astype(np.float32)
    R = np.asarray(se3.rotmat_from_ortho6d(jnp.asarray(x)))
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (20, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_roundtrip_vs_scipy(rng):
    q = Rotation.random(50, random_state=rng)
    R_scipy = q.as_matrix().astype(np.float32)
    R_ours = se3.rotmat_from_quat(jnp.asarray(q.as_quat(), jnp.float32))
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)
    q_back = se3.quat_from_rotmat(jnp.asarray(R_scipy))
    R_back = se3.rotmat_from_quat(q_back)
    np.testing.assert_allclose(R_back, R_scipy, atol=1e-4)


def test_euler_sxyz_vs_scipy(rng):
    e = rng.uniform(-np.pi, np.pi, (20, 3)).astype(np.float32)
    ours = se3.rotmat_from_euler_sxyz(jnp.asarray(e))
    # transforms3d 'sxyz' == scipy extrinsic lowercase 'xyz'.
    expected = Rotation.from_euler("xyz", e).as_matrix()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_normalize_T(rng):
    T = random_se3(rng, (6,))
    T_noisy = T + rng.randn(6, 4, 4).astype(np.float32) * 1e-3
    T_norm = np.asarray(se3.normalize_T(jnp.asarray(T_noisy)))
    R = T_norm[:, :3, :3]
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (6, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(T_norm[:, 3], [[0, 0, 0, 1]] * 6, atol=1e-6)
    # Idempotent on exact SE(3).
    np.testing.assert_allclose(se3.normalize_T(jnp.asarray(T)), T, atol=1e-5)


def test_add_pose_noise_stats(rng):
    T = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2000, 1, 1)))
    out = se3.add_pose_noise(
        jax.random.PRNGKey(0), T, euler_deg_std=(5, 5, 5), trans_std=(0.01, 0.01, 0.05)
    )
    t = np.asarray(out[:, :3, 3])
    assert abs(t[:, 0].std() - 0.01) < 3e-3
    assert abs(t[:, 2].std() - 0.05) < 1e-2
    ang = np.asarray(se3.geodesic_distance(out[:, :3, :3], T[:, :3, :3]))
    assert np.degrees(ang.mean()) < 20


def test_geodesic_distance():
    R1 = jnp.eye(3)[None]
    theta = 0.3
    R2 = se3.rotmat_from_euler_sxyz(jnp.asarray([[0.0, 0.0, theta]]))
    np.testing.assert_allclose(
        se3.geodesic_distance(R1, R2), [theta], atol=1e-5
    )
