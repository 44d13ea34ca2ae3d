import numpy as np

from megapose6d_tpu.ops import se3, so3_grid


def test_quats_are_unit():
    q = so3_grid.super_fibonacci_quats(576)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)


def test_grid_rotmats_valid():
    R = np.asarray(so3_grid.make_so3_grid(72))
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (72, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_grid_covering(rng):
    """Any random rotation must have a grid neighbor within a reasonable
    covering radius (dispersion bound for the 576 grid)."""
    from scipy.spatial.transform import Rotation
    import jax.numpy as jnp

    grid = so3_grid.make_so3_grid(576)
    R = Rotation.random(200, random_state=rng).as_matrix().astype(np.float32)
    d = se3.geodesic_distance(
        jnp.asarray(R)[:, None], grid[None, :, :, :]
    )
    min_d = np.asarray(d).min(axis=1)
    assert min_d.max() < 0.62, min_d.max()  # radians


def test_load_qua_roundtrip(tmp_path):
    q = so3_grid.super_fibonacci_quats(16)
    path = tmp_path / "grid.qua"
    np.savetxt(path, q)
    R = so3_grid.load_qua_grid(path)
    np.testing.assert_allclose(
        R, se3.rotmat_from_quat(q.astype(np.float32)), atol=1e-5
    )
