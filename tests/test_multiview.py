import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from megapose6d_tpu.ops import multiview, se3


def make_TCO(rng, b=2):
    R = Rotation.random(b, random_state=rng).as_matrix().astype(np.float32)
    t = np.asarray([[0.02, -0.01, 0.8]] * b, np.float32)
    return jnp.asarray(se3.make_se3(jnp.asarray(R), jnp.asarray(t)))


def test_single_view_is_identity(rng):
    TCO = make_TCO(rng)
    tCR = TCO[:, :3, 3]
    out = multiview.make_TCO_multiview(TCO, tCR, n_views=1)
    assert out.shape == (2, 1, 4, 4)
    np.testing.assert_allclose(out[:, 0], TCO, atol=1e-5)


def test_front_views_look_at_reference(rng):
    """Every generated view must have the reference point on its optical
    axis (that is what lookAt guarantees in the reference)."""
    TCO = make_TCO(rng)
    tCR = TCO[:, :3, 3]  # ref point = object origin in camera frame
    out = multiview.make_TCO_multiview(
        TCO, tCR, multiview_type="TCO+front_3views", n_views=4
    )
    assert out.shape == (2, 4, 4, 4)
    # View 0 is the raw TCO.
    np.testing.assert_allclose(out[:, 0], TCO, atol=1e-5)
    # Reference point (object origin) in each view camera frame: TCV_O applied
    # to origin. It must lie on the +z axis at distance |tCR|.
    radius = np.linalg.norm(np.asarray(tCR), axis=-1)
    # View 1 = front (offset 0): distance radius. Views 2/3 sit at lateral
    # offset radius -> distance sqrt(2)*radius from the reference point.
    expected_d = [radius, np.sqrt(2) * radius, np.sqrt(2) * radius]
    for v in range(1, 4):
        t = np.asarray(out[:, v, :3, 3])
        np.testing.assert_allclose(t[:, 0], 0.0, atol=1e-4)
        np.testing.assert_allclose(t[:, 1], 0.0, atol=1e-4)
        np.testing.assert_allclose(t[:, 2], expected_d[v - 1], atol=1e-4)


def test_front_1view_on_axis_matches_tco(rng):
    """If tCR is exactly on the optical axis, the front_1view equals TCO."""
    R = Rotation.random(1, random_state=rng).as_matrix().astype(np.float32)
    t = np.asarray([[0.0, 0.0, 0.9]], np.float32)
    TCO = jnp.asarray(se3.make_se3(jnp.asarray(R), jnp.asarray(t)))
    tCR = TCO[:, :3, 3]
    out = multiview.make_TCO_multiview(
        TCO, tCR, multiview_type="TCO+front_1view", n_views=2
    )
    assert out.shape == (1, 2, 4, 4)
    np.testing.assert_allclose(out[:, 1], TCO, atol=1e-4)


def test_sphere_26views_count(rng):
    TCO = make_TCO(rng)
    tCR = TCO[:, :3, 3]
    out = multiview.make_TCO_multiview(
        TCO, tCR, multiview_type="sphere_26views", n_views=27,
        remove_TCO_rendering=True,
    )
    assert out.shape == (2, 26, 4, 4)
    # All views valid SE(3).
    R = np.asarray(out[..., :3, :3]).reshape(-1, 3, 3)
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-4
    )


def test_inplane_rotations(rng):
    TCO = make_TCO(rng)
    tCR = TCO[:, :3, 3]
    out = multiview.make_TCO_multiview(
        TCO,
        tCR,
        multiview_type="TCO+front_3views",
        n_views=4,
        remove_TCO_rendering=True,
        views_inplane_rotations=True,
    )
    assert out.shape == (2, 12, 4, 4)
    # Rotation by pi/2 about camera z: translation unchanged, R rotated.
    np.testing.assert_allclose(out[:, 0, :3, 3], out[:, 1, :3, 3], atol=1e-5)
    ang = se3.geodesic_distance(out[:, 0, :3, :3], out[:, 1, :3, :3])
    np.testing.assert_allclose(ang, np.pi / 2, atol=1e-4)
