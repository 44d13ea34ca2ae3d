import numpy as np

from megapose6d_tpu.ops import mesh_ops, symmetries
import jax.numpy as jnp


def test_continuous_symmetry_z():
    syms = symmetries.make_symmetries_poses(
        symmetries_continuous=[
            symmetries.ContinuousSymmetry(np.zeros(3), np.array([0, 0, 1]))
        ],
        n_symmetries_continuous=4,
        units="m",
    )
    assert syms.shape == (4, 4, 4)
    # Rotations by 0, 90, 180, 270 degrees about z.
    angles = sorted(
        np.degrees(np.arccos(np.clip((np.trace(s[:3, :3]) - 1) / 2, -1, 1)))
        for s in syms
    )
    np.testing.assert_allclose(angles, [0, 90, 90, 180], atol=1e-5)


def test_discrete_symmetry_scaling():
    M = np.eye(4)
    M[:3, 3] = [1000.0, 0, 0]
    syms = symmetries.make_symmetries_poses(
        symmetries_discrete=[symmetries.DiscreteSymmetry(M)], units="mm"
    )
    assert syms.shape == (2, 4, 4)
    np.testing.assert_allclose(syms[0], np.eye(4))  # identity first
    np.testing.assert_allclose(syms[1, :3, 3], [1.0, 0, 0])  # mm -> m


def test_pad_symmetries():
    syms = np.tile(np.eye(4), (3, 1, 1))
    padded, valid = symmetries.pad_symmetries(syms, 8)
    assert padded.shape == (8, 4, 4)
    assert valid.sum() == 3 and valid[:3].all()
    np.testing.assert_allclose(padded[3:], np.tile(np.eye(4), (5, 1, 1)))


def test_mesh_bounding_boxes():
    pts = jnp.asarray(
        [[[0.0, 0, 0], [1, 2, 3], [0.5, 1, 1], [0, 0, 0]]], jnp.float32
    )
    corners = np.asarray(mesh_ops.get_meshes_bounding_boxes(pts))
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners.min(1)[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(corners.max(1)[0], [1, 2, 3], atol=1e-6)
    # With mask excluding the far point.
    valid = jnp.asarray([[True, False, True, True]])
    corners = np.asarray(mesh_ops.get_meshes_bounding_boxes(pts, valid))
    np.testing.assert_allclose(corners.max(1)[0], [0.5, 1, 1], atol=1e-6)


def test_sample_points_deterministic():
    import jax

    pts = jnp.arange(30, dtype=jnp.float32).reshape(1, 10, 3)
    out = mesh_ops.sample_points(None, pts, 5, deterministic=True)
    assert out.shape == (1, 5, 3)
    out_r = mesh_ops.sample_points(jax.random.PRNGKey(0), pts, 5)
    assert out_r.shape == (1, 5, 3)
    # Sampled points are actual rows of the input.
    flat = np.asarray(pts).reshape(-1, 3)
    for row in np.asarray(out_r).reshape(-1, 3):
        assert (np.abs(flat - row).sum(-1) < 1e-6).any()
