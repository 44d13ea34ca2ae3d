"""Equivalence tests: tiled Pallas rasterizer vs the XLA baseline.

On CPU the Pallas kernel runs in interpret mode; the driver's TPU runs
compile the same kernel natively.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from megapose6d_tpu.meshes import make_cube, make_uv_sphere
from megapose6d_tpu.ops import rasterizer
from megapose6d_tpu.ops.rasterizer_tiled import render_meshes_tiled

H, W = 96, 128
K = np.asarray(
    [[260.0, 0, W / 2 - 0.5], [0, 260.0, H / 2 - 0.5], [0, 0, 1]], np.float32
)


def both(mesh, TCO, **kw):
    args = (
        jnp.asarray(mesh.vertices)[None],
        jnp.asarray(mesh.vertex_normals)[None],
        jnp.asarray(mesh.vertex_colors)[None],
        jnp.asarray(mesh.faces)[None],
        jnp.ones((1, mesh.n_faces), bool),
        jnp.asarray(TCO, jnp.float32)[None],
        jnp.asarray(K)[None],
        (H, W),
    )
    ref = rasterizer.render_meshes(*args)
    tiled = render_meshes_tiled(*args, interpret=True, **kw)
    return ref, tiled


def pose_z(z, rx=0.0):
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(rx), np.sin(rx)
    T[:3, :3] = [[1, 0, 0], [0, c, -s], [0, s, c]]
    T[2, 3] = z
    return T


@pytest.mark.parametrize("rx", [0.0, 0.5, 2.0])
def test_cube_equivalence(rx):
    cube = make_cube(0.05)
    ref, tiled = both(cube, pose_z(0.5, rx))
    np.testing.assert_array_equal(
        np.asarray(ref.mask), np.asarray(tiled.mask)
    )
    np.testing.assert_allclose(
        np.asarray(ref.depth), np.asarray(tiled.depth), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.rgb), np.asarray(tiled.rgb), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.normals), np.asarray(tiled.normals), atol=1e-4
    )


def test_sphere_equivalence():
    from scipy import ndimage

    sph = make_uv_sphere(0.04, 16, 24)
    ref, tiled = both(sph, pose_z(0.4))
    mr = np.asarray(ref.mask[0])
    mt = np.asarray(tiled.mask[0])
    diff = mr != mt
    # The two formulations round edge functions differently; any flipped
    # pixels must sit on the silhouette boundary, never in the interior.
    assert diff.mean() < 0.01, diff.mean()
    interior = ndimage.binary_erosion(mr, iterations=2)
    assert not (diff & interior).any()
    # Depths agree except on edge-tie pixels (a pixel exactly on a shared
    # face edge may legitimately resolve to either face).
    m = mr & mt
    d_ref = np.asarray(ref.depth[0])[m]
    d_til = np.asarray(tiled.depth[0])[m]
    d = np.abs(d_ref - d_til)
    assert np.median(d) < 1e-5
    assert (d > 1e-3).mean() < 0.01, (d > 1e-3).mean()


def test_nonfinite_and_empty():
    cube = make_cube(0.05)
    T = pose_z(0.5)
    T[0, 3] = np.nan
    _, tiled = both(cube, T)
    assert not np.asarray(tiled.mask).any()


@pytest.mark.slow
def test_chunk_sizes_equivalent():
    """Chunk granularity must not change the image (only skip efficiency)."""
    sph = make_uv_sphere(0.04, 16, 24)
    _, t16 = both(sph, pose_z(0.4), chunk=16)
    _, t32 = both(sph, pose_z(0.4), chunk=32)
    np.testing.assert_array_equal(np.asarray(t16.mask), np.asarray(t32.mask))
    np.testing.assert_allclose(
        np.asarray(t16.depth), np.asarray(t32.depth), atol=1e-6
    )


@pytest.mark.slow
def test_backface_cull_equivalence():
    """For closed outward-CCW meshes, culling must not change the image."""
    from megapose6d_tpu.meshes import (
        MeshDataBase,
        RigidObject,
        RigidObjectDataset,
    )
    import jax.numpy as jnp

    objs = RigidObjectDataset(
        [RigidObject(label="s", mesh=make_uv_sphere(0.04, 12, 16))]
    )
    db = MeshDataBase.from_object_ds(
        objs, max_faces=512, n_points=64, n_sym=2
    ).batched(align=32)
    m = db.select(jnp.zeros((1,), jnp.int32))
    T = pose_z(0.4)
    args = (
        m.vertices, m.normals, m.colors, m.faces, m.face_valid,
        jnp.asarray(T)[None], jnp.asarray(K)[None], (H, W),
    )
    out0 = render_meshes_tiled(*args, backface_cull=False, interpret=True)
    out1 = render_meshes_tiled(*args, backface_cull=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out0.mask), np.asarray(out1.mask))
    np.testing.assert_allclose(
        np.asarray(out0.depth), np.asarray(out1.depth), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out0.rgb), np.asarray(out1.rgb), atol=1e-6
    )


def test_hyp_pack_equivalence():
    """hyp_pack=2 packs two hypotheses per Pallas program; outputs must be
    bitwise-identical to the unpacked kernel."""
    import jax

    cube = make_cube(0.05)
    sphere = make_uv_sphere(0.05, n_lat=8, n_lon=12)
    F = max(cube.n_faces, sphere.n_faces)

    def pad(mesh):
        f = np.zeros((F, 3), np.int32)
        f[: mesh.n_faces] = mesh.faces
        fv = np.zeros((F,), bool)
        fv[: mesh.n_faces] = True
        return f, fv

    fc, vc = pad(cube)
    fs, vs = pad(sphere)
    verts = jnp.stack(
        [
            jnp.asarray(cube.vertices),
            jnp.pad(
                jnp.asarray(sphere.vertices),
                ((0, len(cube.vertices) - len(sphere.vertices)), (0, 0)),
                mode="edge",
            )
            if len(sphere.vertices) < len(cube.vertices)
            else jnp.asarray(sphere.vertices)[: len(cube.vertices)],
        ]
    )
    norms = jnp.ones_like(verts)
    cols = jnp.full_like(verts, 0.5)
    faces = jnp.stack([jnp.asarray(fc), jnp.asarray(fs)])
    fvalid = jnp.stack([jnp.asarray(vc), jnp.asarray(vs)])
    TCO = jnp.stack(
        [jnp.asarray(pose_z(0.5, 0.3)), jnp.asarray(pose_z(0.7, 1.1))]
    )
    Ks = jnp.broadcast_to(jnp.asarray(K), (2, 3, 3))

    args = (verts, norms, cols, faces, fvalid, TCO, Ks, (H, W))
    base = render_meshes_tiled(*args, interpret=True)
    packed = render_meshes_tiled(*args, interpret=True, hyp_pack=2)
    for name in ("rgb", "depth", "mask", "normals"):
        np.testing.assert_array_equal(
            np.asarray(getattr(base, name)),
            np.asarray(getattr(packed, name)),
            err_msg=name,
        )
    # B=3 not divisible by 2 -> silent fallback, still correct.
    args3 = tuple(
        jnp.concatenate([a, a[:1]]) if hasattr(a, "shape") else a
        for a in args[:7]
    ) + ((H, W),)
    b3 = render_meshes_tiled(*args3, interpret=True, hyp_pack=2)
    np.testing.assert_array_equal(
        np.asarray(b3.mask[:2]), np.asarray(base.mask)
    )


def test_face_segmentation_equivalence():
    """Large meshes render in face segments merged by z inside a
    lax.scan (one Pallas compile for any segment count); outputs must
    match the single-segment path. Masks are exact; float channels get a
    tight tolerance — the scan body fuses the plane-coefficient math
    differently than the straight-line graph (~1e-5 rounding skew),
    while a real merge bug (wrong face-id offset, wrong winner) is O(1)."""
    sphere = make_uv_sphere(0.05, n_lat=12, n_lon=16)
    TCO = pose_z(0.4, 0.7)
    _, whole = both(sphere, TCO)
    # Force ~4 segments (n_faces ~ 320+, chunk 16 -> seg_F = 96).
    _, seg = both(sphere, TCO, max_faces_per_program=96)
    np.testing.assert_array_equal(
        np.asarray(whole.mask), np.asarray(seg.mask)
    )
    for name in ("depth", "rgb", "normals"):
        np.testing.assert_allclose(
            np.asarray(getattr(whole, name)),
            np.asarray(getattr(seg, name)),
            rtol=1e-3, atol=1e-3, err_msg=name,
        )
