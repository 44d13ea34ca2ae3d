"""Per-pixel texture sampling (reference capability: Panda3D textured
render, panda3d_scene_renderer.py:298-358).

Golden test: a camera-facing unit quad textured with a checkerboard must
reproduce the checker pattern at pixel level in both renderers, and the
textured result must differ from the vertex-baked one on high-frequency
content.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from megapose6d_tpu.meshes import (
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
)
from megapose6d_tpu.meshes.io import TriMesh, bake_texture_to_colors
from megapose6d_tpu.ops import rasterizer
from megapose6d_tpu.ops.rasterizer_tiled import render_meshes_tiled


def make_checker(n=8, cell=16):
    """[n*cell, n*cell, 3] uint8 checkerboard."""
    y, x = np.mgrid[0 : n * cell, 0 : n * cell]
    c = ((x // cell + y // cell) % 2).astype(np.uint8) * 255
    return np.stack([c, c, c], axis=-1)


def make_textured_quad(half=0.5):
    """Two triangles spanning [-half, half]^2 at z=0, facing -z (toward a
    camera looking along +z), with UVs covering the full texture."""
    verts = np.array(
        [
            [-half, -half, 0.0],
            [half, -half, 0.0],
            [half, half, 0.0],
            [-half, half, 0.0],
        ],
        np.float32,
    )
    # Outward normal toward camera (camera at z<0 looking +z => faces
    # wind so the projected area sign matches backface_cull=False here).
    faces = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    uvs = np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], np.float32
    )
    return TriMesh(
        vertices=verts,
        faces=faces,
        vertex_uvs=uvs,
        texture=make_checker(),
        vertex_colors=np.full((4, 3), 0.5, np.float32),
    )


def _render_setup():
    mesh = make_textured_quad()
    obj = RigidObject(label="quad", mesh=mesh)
    db = MeshDataBase.from_object_ds(
        RigidObjectDataset([obj]), max_faces=128, n_points=16, n_sym=2,
        texture_size=128,
    )
    bm = db.batched(align=8)
    assert bm.textures is not None and bool(bm.has_tex[0])
    m = bm.select(jnp.zeros((1,), jnp.int32))
    TCO = jnp.eye(4)[None].at[0, 2, 3].set(1.0)
    K = jnp.asarray([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]])
    return m, TCO, K


def _expected_checker(rgb, mask):
    """Sample a few interior pixels and compare against the checker."""
    H, W = rgb.shape[1:3]
    cx, cy = 32, 32  # principal point; quad spans +-50 px
    hits = 0
    for du in (-30, -18, 18, 30):
        for dv in (-30, -18, 18, 30):
            u, v = cx + du, cy + dv
            assert mask[0, v, u]
            # uv in [0,1]: the quad maps x->u (right), y->v; texture v
            # flipped at load stays consistent through the pipeline.
            tex_u = (du / 100.0 + 0.5)
            tex_v = (dv / 100.0 + 0.5)
            cell = (int(tex_u * 8) + int(tex_v * 8)) % 2
            val = float(rgb[0, v, u, 0])
            # ambient=1.0 lighting: intensity == |n|_1 terms; just check
            # black vs white cells are separated.
            if cell == 1:
                assert val > 0.5, (du, dv, val)
            else:
                assert val < 0.5, (du, dv, val)
            hits += 1
    assert hits == 16


@pytest.mark.slow
def test_textured_quad_scan_renderer():
    m, TCO, K = _render_setup()
    out = rasterizer.render_meshes(
        m.vertices, m.normals, m.colors, m.faces, m.face_valid, TCO, K,
        (64, 64), light_ambient=1.0, light_point=0.0,
        uvs=m.uvs, textures=m.textures, has_tex=m.has_tex,
    )
    _expected_checker(np.asarray(out.rgb), np.asarray(out.mask))


def test_textured_quad_tiled_renderer():
    m, TCO, K = _render_setup()
    out = render_meshes_tiled(
        m.vertices, m.normals, m.colors, m.faces, m.face_valid, TCO, K,
        (64, 64), light_ambient=1.0, light_point=0.0, interpret=True,
        uvs=m.uvs, textures=m.textures, has_tex=m.has_tex,
    )
    _expected_checker(np.asarray(out.rgb), np.asarray(out.mask))


def test_textured_differs_from_baked():
    m, TCO, K = _render_setup()
    out_tex = rasterizer.render_meshes(
        m.vertices, m.normals, m.colors, m.faces, m.face_valid, TCO, K,
        (64, 64), light_ambient=1.0, light_point=0.0,
        uvs=m.uvs, textures=m.textures, has_tex=m.has_tex,
    )
    out_baked = rasterizer.render_meshes(
        m.vertices, m.normals, m.colors, m.faces, m.face_valid, TCO, K,
        (64, 64), light_ambient=1.0, light_point=0.0,
    )
    # Same silhouette, very different interior (checker vs flat gray).
    assert np.array_equal(np.asarray(out_tex.mask), np.asarray(out_baked.mask))
    diff = np.abs(np.asarray(out_tex.rgb) - np.asarray(out_baked.rgb))
    assert diff.max() > 0.3


def test_bake_texture_to_colors():
    mesh = make_textured_quad()
    baked = bake_texture_to_colors(mesh)
    assert baked.texture is None and baked.vertex_uvs is None
    assert baked.vertex_colors is not None
    # Corner (0,0) of the checker is a black cell; corner (1,1) likewise
    # (8x8 board: parity of 7+7 is even => black). (1,0)/(0,1) are white.
    c = baked.vertex_colors
    assert c[0].max() < 0.2 and c[2].max() < 0.2
    assert c[1].min() > 0.8 and c[3].min() > 0.8


def test_obj_roundtrip_keeps_uvs(tmp_path):
    """OBJ with per-corner vt loads with split vertices + texture."""
    tex = make_checker(2, 4)
    from PIL import Image

    Image.fromarray(tex).save(tmp_path / "t.png")
    (tmp_path / "m.mtl").write_text("newmtl m\nmap_Kd t.png\n")
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n"
    )
    from megapose6d_tpu.meshes.io import load_obj

    mesh = load_obj(tmp_path / "q.obj", bake_texture=False)
    assert mesh.texture is not None
    assert mesh.vertex_uvs is not None
    assert mesh.vertex_uvs.shape[0] == mesh.n_vertices
    assert mesh.faces.shape == (2, 3)
    # Full-range UVs survive: u=1.0 must NOT wrap to 0.0, and GL v=0 maps
    # to image v=1.0 (the round-2 `% 1.0` bug collapsed all four corners
    # to (0,0)). Vertices are unique (v,vt) pairs sorted by (v_idx,vt_idx):
    # v1/vt(0,0) -> img (0,1); v2/vt(1,0) -> (1,1); v3/vt(1,1) -> (1,0);
    # v4/vt(0,1) -> (0,0).
    expected = np.array(
        [[0.0, 1.0], [1.0, 1.0], [1.0, 0.0], [0.0, 0.0]], np.float32
    )
    np.testing.assert_allclose(mesh.vertex_uvs, expected, atol=1e-6)
    # Baked path still works too.
    baked = load_obj(tmp_path / "q.obj", bake_texture=True)
    assert baked.vertex_colors is not None and baked.texture is None


def test_ply_roundtrip_keeps_uvs(tmp_path):
    tex = make_checker(2, 4)
    from PIL import Image

    Image.fromarray(tex).save(tmp_path / "obj_01.png")
    header = (
        "ply\nformat ascii 1.0\n"
        "comment TextureFile obj_01.png\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float texture_u\nproperty float texture_v\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 0.0 0.0\n1 0 0 1.0 0.0\n1 1 0 1.0 1.0\n"
        "3 0 1 2\n"
    )
    (tmp_path / "m.ply").write_text(header)
    from megapose6d_tpu.meshes.io import load_ply

    mesh = load_ply(tmp_path / "m.ply")
    assert mesh.texture is not None
    assert mesh.vertex_uvs is not None and mesh.vertex_uvs.shape == (3, 2)
    # texture_v flipped to image convention.
    np.testing.assert_allclose(mesh.vertex_uvs[0], [0.0, 1.0])


def test_mesh_db_select_carries_textures():
    mesh = make_textured_quad()
    objs = RigidObjectDataset(
        [
            RigidObject(label="tex", mesh=mesh),
            RigidObject(
                label="plain",
                mesh=TriMesh(
                    vertices=mesh.vertices,
                    faces=mesh.faces,
                    vertex_colors=np.full((4, 3), 0.25, np.float32),
                ),
            ),
        ]
    )
    db = MeshDataBase.from_object_ds(
        objs, max_faces=128, n_points=16, n_sym=2, texture_size=64
    )
    bm = db.batched(align=8)
    assert bm.textures.shape[1:] == (64, 64, 3)
    assert bool(bm.has_tex[0]) and not bool(bm.has_tex[1])
    sel = bm.select(jnp.asarray([1, 0, 0], jnp.int32))
    assert sel.textures.shape[0] == 3
    assert [bool(x) for x in sel.has_tex] == [False, True, True]


def test_textured_primitives():
    """make_cube/make_uv_sphere textured=True produce valid UV-mapped
    meshes that survive MeshDataBase batching with textures attached."""
    from megapose6d_tpu.meshes.io import make_cube, make_uv_sphere

    cube = make_cube(0.05, textured=True, seed=0)
    sph = make_uv_sphere(0.04, 8, 12, textured=True, seed=1)
    for m in (cube, sph):
        assert m.vertex_uvs is not None and m.vertex_uvs.shape == (
            m.n_vertices,
            2,
        )
        assert m.texture is not None and m.texture.dtype == np.uint8
        assert m.vertex_uvs.min() >= 0.0 and m.vertex_uvs.max() <= 1.0
    # Cube atlas: the 6 faces cover 6 distinct tiles.
    tiles = set()
    for f in range(6):
        u, v = cube.vertex_uvs[4 * f]
        tiles.add((int(u * 3), int(v * 2)))
    assert len(tiles) == 6
    db = MeshDataBase.from_object_ds(
        RigidObjectDataset(
            [RigidObject(label="c", mesh=cube), RigidObject(label="s", mesh=sph)]
        ),
        max_faces=512,
        n_points=32,
        n_sym=2,
        texture_size=64,
    ).batched(align=8)
    assert db.textures is not None
    assert [bool(x) for x in db.has_tex] == [True, True]


def test_synthetic_batch_renders_textures():
    """synthetic_batch_fn passes the texture planes through to the obs
    render: a textured cube's pixels must show high-frequency variation
    (a vertex-color cube of one flat color per face cannot)."""
    import jax

    from megapose6d_tpu.meshes.io import make_cube
    from megapose6d_tpu.training.train import synthetic_batch_fn

    cube = make_cube(0.05, textured=True, seed=3)
    db = MeshDataBase.from_object_ds(
        RigidObjectDataset([RigidObject(label="c", mesh=cube)]),
        max_faces=64,
        n_points=32,
        n_sym=2,
        texture_size=96,
    ).batched(align=8)
    batch = jax.jit(synthetic_batch_fn(db, 2, (64, 80), f=80.0))(
        jax.random.PRNGKey(0)
    )
    rgb = np.asarray(batch.rgbs)
    mask = rgb.sum(-1) > 0.02
    assert mask.any()
    # In-object per-channel std: flat-per-face vertex-color cubes sit well
    # under 0.08; the random block texture is far above.
    std = rgb[mask].std(0).mean()
    assert std > 0.12, std


def test_textured_cylinder_and_cone():
    """make_cylinder/make_cone textured=True: seam-safe UV-mapped meshes
    (novel-object eval world, demo_ar_baseline world=novel) whose renders
    show the high-frequency block texture."""
    import jax

    from megapose6d_tpu.meshes.io import make_cone, make_cylinder
    from megapose6d_tpu.training.train import synthetic_batch_fn

    cyl = make_cylinder(0.022, 0.09, n_seg=12, textured=True, seed=7)
    cone = make_cone(0.035, 0.08, n_seg=12, textured=True, seed=8)
    for m in (cyl, cone):
        assert m.vertex_uvs is not None and m.vertex_uvs.shape == (
            m.n_vertices,
            2,
        )
        assert m.texture is not None and m.texture.dtype == np.uint8
        assert m.vertex_uvs.min() >= 0.0 and m.vertex_uvs.max() <= 1.0
        # No face spans the u seam: within-face u range stays local
        # (the duplicated seam column keeps interpolation off the
        # u=1->0 jump that smears the whole texture across one face).
        span = np.ptp(m.vertex_uvs[m.faces, 0], axis=1)
        assert span.max() < 0.5, span.max()
    # Geometry sanity: radii and extents survive the UV rebuild.
    r = np.linalg.norm(cyl.vertices[:, :2], axis=-1)
    assert r.max() == pytest.approx(0.022, abs=1e-6)
    assert abs(cyl.vertices[:, 2]).max() == pytest.approx(0.045)
    assert cone.vertices[:, 2].max() == pytest.approx(0.08)

    db = MeshDataBase.from_object_ds(
        RigidObjectDataset(
            [
                RigidObject(label="cyl", mesh=cyl),
                RigidObject(label="cone", mesh=cone),
            ]
        ),
        max_faces=128,
        n_points=32,
        n_sym=2,
        texture_size=96,
    ).batched(align=8)
    assert [bool(x) for x in db.has_tex] == [True, True]
    batch = jax.jit(synthetic_batch_fn(db, 4, (64, 80), f=80.0))(
        jax.random.PRNGKey(0)
    )
    rgb = np.asarray(batch.rgbs)
    mask = rgb.sum(-1) > 0.02
    assert mask.any()
    std = rgb[mask].std(0).mean()
    assert std > 0.12, std


def test_novel_world_builds():
    """demo_ar_baseline's world=novel builds a batched textured mesh_db
    distinct from the training world (the novel-object transfer row)."""
    from megapose6d_tpu.scripts.demo_ar_baseline import build_bop_world

    db, objs = build_bop_world("novel")
    assert list(db.labels) == ["obj_000001", "obj_000002"]
    assert db.textures is not None
    demo_db, _ = build_bop_world("demo")
    # Same label surface, different geometry: a checkpoint trained on
    # the demo world sees genuinely new shapes.
    assert db.points.shape[-1] == demo_db.points.shape[-1] == 3
    assert not np.allclose(
        np.asarray(db.points.mean(1)), np.asarray(demo_db.points.mean(1))
    )
