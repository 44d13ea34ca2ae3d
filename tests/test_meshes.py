import numpy as np
import pytest

from megapose6d_tpu.meshes import (
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
    TriMesh,
    load_mesh,
    make_cube,
    make_uv_sphere,
    simplify_vertex_clustering,
)
from megapose6d_tpu.ops.symmetries import ContinuousSymmetry


def test_cube_geometry():
    cube = make_cube(0.05)
    assert cube.n_vertices == 24 and cube.n_faces == 12
    assert np.allclose(np.abs(cube.vertices).max(), 0.05)
    # Outward normals: vertex normal dot position > 0 for a centered cube.
    dots = (cube.vertex_normals * cube.vertices).sum(-1)
    assert (dots > 0).all()
    assert abs(cube.diameter() - 0.1 * np.sqrt(3)) < 1e-6


def test_sphere_geometry():
    sph = make_uv_sphere(0.07, 12, 18)
    r = np.linalg.norm(sph.vertices, axis=-1)
    np.testing.assert_allclose(r, 0.07, atol=1e-6)
    assert abs(sph.diameter() - 0.14) < 2e-3


def test_ply_roundtrip_ascii(tmp_path):
    cube = make_cube(0.02)
    p = tmp_path / "cube.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {cube.n_vertices}\n")
        f.write(
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        )
        f.write(f"element face {cube.n_faces}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v, c in zip(cube.vertices, cube.vertex_colors):
            f.write(
                f"{v[0]} {v[1]} {v[2]} "
                f"{int(c[0]*255)} {int(c[1]*255)} {int(c[2]*255)}\n"
            )
        for face in cube.faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
    m = load_mesh(p)
    np.testing.assert_allclose(m.vertices, cube.vertices, atol=1e-5)
    np.testing.assert_allclose(m.faces, cube.faces)
    np.testing.assert_allclose(m.vertex_colors, cube.vertex_colors, atol=1 / 255)


def test_ply_binary(tmp_path):
    cube = make_cube(0.02)
    p = tmp_path / "cube_bin.ply"
    with open(p, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {cube.n_vertices}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {cube.n_faces}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode())
        f.write(cube.vertices.astype("<f4").tobytes())
        for face in cube.faces:
            f.write(np.uint8(3).tobytes())
            f.write(face.astype("<i4").tobytes())
    m = load_mesh(p)
    np.testing.assert_allclose(m.vertices, cube.vertices, atol=1e-6)
    np.testing.assert_allclose(m.faces, cube.faces)


def test_obj_load(tmp_path):
    cube = make_cube(0.03)
    p = tmp_path / "cube.obj"
    with open(p, "w") as f:
        for v in cube.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in cube.faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    m = load_mesh(p)
    np.testing.assert_allclose(m.vertices, cube.vertices, atol=1e-6)
    np.testing.assert_allclose(m.faces, cube.faces)


def test_simplify_vertex_clustering():
    sph = make_uv_sphere(0.05, 32, 48)
    simp = simplify_vertex_clustering(sph, 500)
    assert simp.n_faces <= 500
    assert simp.n_faces > 50
    # Shape preserved: all vertices still near radius 0.05.
    r = np.linalg.norm(simp.vertices, axis=-1)
    assert abs(np.median(r) - 0.05) < 0.01


def test_mesh_db_batched():
    objs = RigidObjectDataset(
        [
            RigidObject(label="cube", mesh=make_cube(0.05)),
            RigidObject(
                label="sphere",
                mesh=make_uv_sphere(0.03),
                symmetries_continuous=[
                    ContinuousSymmetry(np.zeros(3), np.array([0, 0, 1]))
                ],
            ),
        ]
    )
    db = MeshDataBase.from_object_ds(objs, max_faces=1024, n_points=256, n_sym=16)
    batched = db.batched(align=64)
    L, V, _ = batched.vertices.shape
    assert L == 2 and V % 64 == 0
    assert batched.faces.shape[0] == 2
    assert batched.labels == ("cube", "sphere")
    # Padded faces are degenerate (0,0,0).
    fv = np.asarray(batched.face_valid)
    ff = np.asarray(batched.faces)
    assert (ff[~fv] == 0).all()
    # Symmetries: cube has only identity; sphere has 8 continuous.
    sv = np.asarray(batched.sym_valid)
    assert sv[0].sum() == 1 and sv[1].sum() == 8
    # Diameters.
    np.testing.assert_allclose(
        np.asarray(batched.diameters), [0.1 * np.sqrt(3), 0.06], atol=1e-3
    )
    # select() gathers by index.
    idx = batched.label_to_index(["sphere", "cube", "sphere"])
    sel = batched.select(idx)
    assert sel.vertices.shape[0] == 3
    np.testing.assert_allclose(
        np.asarray(sel.diameters), [0.06, 0.1 * np.sqrt(3), 0.06], atol=1e-3
    )


def test_mesh_units_scaling():
    cube_mm = make_cube(50.0)  # 50 mm half-extent
    obj = RigidObject(label="c", mesh=cube_mm, mesh_units="mm")
    m = obj.load()
    assert abs(np.abs(m.vertices).max() - 0.05) < 1e-6


def test_debug_primitives():
    from megapose6d_tpu.meshes import make_axes, make_cone, make_cylinder

    cyl = make_cylinder(0.02, 0.1, 16)
    assert cyl.n_faces == 16 * 4
    r = np.linalg.norm(cyl.vertices[:32, :2], axis=-1)
    np.testing.assert_allclose(r, 0.02, atol=1e-6)
    assert abs(cyl.vertices[:, 2]).max() == pytest.approx(0.05)

    cone = make_cone(0.02, 0.06, 16)
    assert cone.vertices[:, 2].max() == pytest.approx(0.06)
    assert cone.n_faces == 32

    axes = make_axes(0.1)
    # Each axis reaches ~length along its direction.
    assert axes.vertices[:, 0].max() > 0.09
    assert axes.vertices[:, 1].max() > 0.09
    assert axes.vertices[:, 2].max() > 0.09
    # Watertight-ish: renders without degenerate explosion.
    import jax.numpy as jnp

    from megapose6d_tpu.ops import rasterizer

    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.4
    K = np.asarray([[200.0, 0, 48], [0, 200.0, 36], [0, 0, 1]], np.float32)
    out = rasterizer.render_meshes(
        jnp.asarray(axes.vertices)[None],
        jnp.asarray(axes.vertex_normals)[None],
        jnp.asarray(axes.vertex_colors)[None],
        jnp.asarray(axes.faces)[None],
        jnp.ones((1, axes.n_faces), bool),
        jnp.asarray(T)[None], jnp.asarray(K)[None], (72, 96),
    )
    assert np.asarray(out.mask).sum() > 50


def test_save_ply_textured_roundtrip(tmp_path):
    """save_ply persists texture_u/texture_v + the TextureFile PNG so a
    per-pixel-textured mesh round-trips through the BOP models/ layout
    (reference ships textured YCB-V PLYs in exactly this convention)."""
    from megapose6d_tpu.meshes import save_ply

    cube = make_cube(0.02, textured=True)
    assert cube.vertex_uvs is not None and cube.texture is not None
    p = tmp_path / "obj_000001.ply"
    save_ply(cube, p)
    assert (tmp_path / "obj_000001.png").exists()
    m = load_mesh(p)
    np.testing.assert_allclose(m.vertices, cube.vertices, atol=1e-5)
    np.testing.assert_array_equal(m.faces, cube.faces)
    assert m.texture is not None and m.vertex_uvs is not None
    np.testing.assert_array_equal(m.texture, cube.texture)
    # UVs survive the GL<->image v-flip round trip.
    np.testing.assert_allclose(m.vertex_uvs, cube.vertex_uvs, atol=1e-6)
