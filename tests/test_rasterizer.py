import jax.numpy as jnp
import numpy as np
import pytest

from megapose6d_tpu.meshes import make_cube, make_uv_sphere
from megapose6d_tpu.ops import rasterizer

H, W = 120, 160
K = np.asarray(
    [[300.0, 0, W / 2 - 0.5], [0, 300.0, H / 2 - 0.5], [0, 0, 1]], np.float32
)


def render_one(mesh, TCO, resolution=(H, W), K_=None, **kw):
    Km = K if K_ is None else K_
    return rasterizer.render_meshes(
        jnp.asarray(mesh.vertices)[None],
        jnp.asarray(mesh.vertex_normals)[None],
        jnp.asarray(mesh.vertex_colors)[None],
        jnp.asarray(mesh.faces)[None],
        jnp.ones((1, mesh.n_faces), bool),
        jnp.asarray(TCO, jnp.float32)[None],
        jnp.asarray(Km)[None],
        resolution,
        **kw,
    )


def pose_z(z):
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = z
    return T


def test_cube_silhouette_and_depth():
    cube = make_cube(0.05)
    out = render_one(cube, pose_z(0.5))
    mask = np.asarray(out.mask[0])
    depth = np.asarray(out.depth[0])
    # Front face at z=0.45, half-size 0.05 -> screen half-size 300*0.05/0.45.
    half_px = 300 * 0.05 / 0.45
    expected_area = (2 * half_px) ** 2
    area = mask.sum()
    assert abs(area - expected_area) / expected_area < 0.05, (
        area,
        expected_area,
    )
    # Depth at image center = front face distance.
    cy, cx = H // 2, W // 2
    np.testing.assert_allclose(depth[cy, cx], 0.45, atol=1e-3)
    # Background depth is 0.
    assert depth[0, 0] == 0 and not mask[0, 0]
    # Mask is centered.
    ys, xs = np.nonzero(mask)
    np.testing.assert_allclose(xs.mean(), W / 2 - 0.5, atol=1.0)
    np.testing.assert_allclose(ys.mean(), H / 2 - 0.5, atol=1.0)


def test_cube_normals_and_color():
    cube = make_cube(0.05, color=(0.8, 0.2, 0.2))
    out = render_one(cube, pose_z(0.5))
    cy, cx = H // 2, W // 2
    n = np.asarray(out.normals[0, cy, cx])
    # Front face: eye-space normal (0,0,-1) -> (0.5, 0.5, 0).
    np.testing.assert_allclose(n, [0.5, 0.5, 0.0], atol=0.05)
    rgb = np.asarray(out.rgb[0, cy, cx])
    # Intensity = 0.1 + 0.4 * ||n_obj||_1 = 0.5 on an axis-aligned face.
    np.testing.assert_allclose(rgb, [0.8 * 0.5, 0.2 * 0.5, 0.2 * 0.5], atol=0.03)


def test_translation_moves_silhouette():
    cube = make_cube(0.05)
    T = pose_z(0.5)
    T[0, 3] = 0.05  # +x by 5cm -> +30px at fx=300, z=0.5
    out = render_one(cube, T)
    mask = np.asarray(out.mask[0])
    ys, xs = np.nonzero(mask)
    # Silhouette dominated by the front face at z = 0.45.
    np.testing.assert_allclose(
        xs.mean(), W / 2 - 0.5 + 300 * 0.05 / 0.45, atol=3.0
    )


def test_sphere_depth_profile():
    sph = make_uv_sphere(0.04, 24, 32)
    out = render_one(sph, pose_z(0.4))
    depth = np.asarray(out.depth[0])
    cy, cx = H // 2, W // 2
    # Nearest point of the sphere: z - r (slight facet error allowed).
    np.testing.assert_allclose(depth[cy, cx], 0.4 - 0.04, atol=2e-3)
    mask = np.asarray(out.mask[0])
    r_px = 300 * 0.04 / np.sqrt(0.4**2 - 0.04**2)
    np.testing.assert_allclose(mask.sum(), np.pi * r_px**2, rtol=0.05)


def test_nonfinite_pose_renders_empty():
    cube = make_cube(0.05)
    T = pose_z(0.5)
    T[0, 3] = np.nan
    out = render_one(cube, T)
    assert not np.asarray(out.mask).any()
    assert (np.asarray(out.rgb) == 0).all()


def test_behind_camera_renders_empty():
    cube = make_cube(0.05)
    out = render_one(cube, pose_z(-0.5))
    assert not np.asarray(out.mask).any()


def test_face_valid_mask():
    cube = make_cube(0.05)
    # Invalidate the front (-z facing camera at +z... object -z faces) faces:
    # just invalidate all -> empty.
    out = rasterizer.render_meshes(
        jnp.asarray(cube.vertices)[None],
        jnp.asarray(cube.vertex_normals)[None],
        jnp.asarray(cube.vertex_colors)[None],
        jnp.asarray(cube.faces)[None],
        jnp.zeros((1, cube.n_faces), bool),
        jnp.asarray(pose_z(0.5))[None],
        jnp.asarray(K)[None],
        (H, W),
    )
    assert not np.asarray(out.mask).any()


def test_occlusion_ordering():
    """A small near cube in front of a large far cube: center pixel must
    show the near depth."""
    near = make_cube(0.02)
    far = make_cube(0.08)
    verts = np.concatenate([near.vertices, far.vertices + [0, 0, 0.2]])
    faces = np.concatenate([near.faces, far.faces + near.n_vertices])
    normals = np.concatenate([near.vertex_normals, far.vertex_normals])
    colors = np.concatenate(
        [
            np.tile([1.0, 0, 0], (near.n_vertices, 1)),
            np.tile([0, 1.0, 0], (far.n_vertices, 1)),
        ]
    ).astype(np.float32)
    out = rasterizer.render_meshes(
        jnp.asarray(verts)[None],
        jnp.asarray(normals)[None],
        jnp.asarray(colors)[None],
        jnp.asarray(faces)[None],
        jnp.ones((1, len(faces)), bool),
        jnp.asarray(pose_z(0.5))[None],
        jnp.asarray(K)[None],
        (H, W),
    )
    cy, cx = H // 2, W // 2
    depth = np.asarray(out.depth[0])
    np.testing.assert_allclose(depth[cy, cx], 0.5 - 0.02, atol=1e-3)
    rgb = np.asarray(out.rgb[0, cy, cx])
    assert rgb[0] > rgb[1]  # red (near) wins
    # Far cube visible around the near one.
    off = int(300 * 0.06 / 0.7) + 6
    assert np.asarray(out.mask[0])[cy, cx + off]
    np.testing.assert_allclose(depth[cy, cx + off], 0.7 - 0.08, atol=2e-3)


def test_render_resolution_240x320():
    cube = make_cube(0.05)
    K2 = np.asarray(
        [[600.0, 0, 160], [0, 600.0, 120], [0, 0, 1]], np.float32
    )
    out = render_one(cube, pose_z(0.6), resolution=(240, 320), K_=K2)
    assert out.rgb.shape == (1, 240, 320, 3)
    assert np.asarray(out.mask).sum() > 100
