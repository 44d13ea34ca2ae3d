import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from megapose6d_tpu.data.tensor_collection import PandasTensorCollection
from megapose6d_tpu.inference.depth_refiner import ICPRefiner
from megapose6d_tpu.meshes import (
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
    make_cube,
    make_uv_sphere,
)
from megapose6d_tpu.ops import icp, rasterizer
from megapose6d_tpu.ops.se3 import geodesic_distance

H, W = 96, 128
K = np.asarray(
    [[260.0, 0, W / 2 - 0.5], [0, 260.0, H / 2 - 0.5], [0, 0, 1]], np.float32
)


def test_depth_to_xyz_roundtrip():
    depth = jnp.full((H, W), 0.7, jnp.float32)
    xyz = icp.depth_to_xyz(depth, jnp.asarray(K))
    # Center pixel maps to (0, 0, z).
    np.testing.assert_allclose(
        xyz[H // 2, W // 2], [0.5 * 0.7 / 260, 0.5 * 0.7 / 260, 0.7], atol=1e-3
    )
    # Reprojection: u = fx * x / z + cx.
    u = 260 * np.asarray(xyz[..., 0]) / 0.7 + K[0, 2]
    np.testing.assert_allclose(u[0], np.arange(W), atol=1e-3)


def test_depth_normals_plane():
    # A fronto-parallel plane: normals = (0, 0, -1) (toward camera).
    depth = jnp.full((H, W), 0.5, jnp.float32)
    n = np.asarray(icp.depth_normals(depth, jnp.asarray(K)))
    np.testing.assert_allclose(n[10:-10, 10:-10, 2], -1.0, atol=1e-3)


def render_depth(mesh, T):
    out = rasterizer.render_meshes(
        jnp.asarray(mesh.vertices)[None],
        jnp.asarray(mesh.vertex_normals)[None],
        jnp.asarray(mesh.vertex_colors)[None],
        jnp.asarray(mesh.faces)[None],
        jnp.ones((1, mesh.n_faces), bool),
        jnp.asarray(T, jnp.float32)[None],
        jnp.asarray(K)[None],
        (H, W),
    )
    return out.depth[0]


def test_icp_recovers_translation_offset():
    sph = make_uv_sphere(0.05, 16, 24)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.01, -0.005, 0.5]
    depth_measured = render_depth(sph, T_gt)

    T_pred = T_gt.copy()
    T_pred[:3, 3] += [0.012, 0.008, 0.02]  # ~2.5 cm off
    depth_rendered = render_depth(sph, T_pred)

    res = icp.icp_refine_pose(
        jax.random.PRNGKey(0),
        jnp.asarray(T_pred),
        depth_measured,
        depth_rendered,
        jnp.asarray(K),
        n_points=512,
        n_iterations=25,
    )
    assert bool(res.valid)
    T_ref = np.asarray(res.T_delta @ T_pred)
    err_before = np.linalg.norm(T_pred[:3, 3] - T_gt[:3, 3])
    err_after = np.linalg.norm(T_ref[:3, 3] - T_gt[:3, 3])
    assert err_after < err_before * 0.35, (err_before, err_after)


def test_icp_nan_depth_pixels_dont_poison_solve():
    """NaN pixels in the measured depth (real sensors emit them) make
    depth_normals NaN at their finite-depth NEIGHBORS; those rows enter
    the point-to-plane solve as nearest neighbors and poisoned
    b = (J w)^T r through 0 * NaN = NaN — the transform came back NaN
    with valid=True (r05 depth-refined AR row had NaN medians)."""
    sph = make_uv_sphere(0.05, 16, 24)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.01, -0.005, 0.5]
    depth_measured = np.array(render_depth(sph, T_gt))  # writable copy
    # Sensor dropouts inside the object silhouette.
    ys, xs = np.where(depth_measured > 0)
    depth_measured[ys[:: max(1, len(ys) // 40)],
                   xs[:: max(1, len(xs) // 40)]] = np.nan

    T_pred = T_gt.copy()
    T_pred[:3, 3] += [0.012, 0.008, 0.02]
    depth_rendered = render_depth(sph, T_pred)

    res = icp.icp_refine_pose(
        jax.random.PRNGKey(0),
        jnp.asarray(T_pred),
        jnp.asarray(depth_measured),
        depth_rendered,
        jnp.asarray(K),
        n_points=512,
        n_iterations=25,
    )
    T_ref = np.asarray(res.T_delta @ T_pred)
    assert np.isfinite(T_ref).all()
    assert bool(res.valid)
    err_before = np.linalg.norm(T_pred[:3, 3] - T_gt[:3, 3])
    err_after = np.linalg.norm(T_ref[:3, 3] - T_gt[:3, 3])
    assert err_after < err_before, (err_before, err_after)


def test_icp_refiner_end_to_end():
    objs = RigidObjectDataset(
        [RigidObject(label="cube", mesh=make_cube(0.04))]
    )
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=64, n_points=128, n_sym=2
    ).batched(align=32)

    cube = make_cube(0.04)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[2, 3] = 0.5
    depth_measured = np.asarray(render_depth(cube, T_gt))

    T_pred = T_gt.copy()
    T_pred[0, 3] += 0.015
    preds = PandasTensorCollection(
        pd.DataFrame({"label": ["cube"]}), poses=T_pred[None]
    )
    refiner = ICPRefiner(mesh_db, n_points=512, n_iterations=20,
                         resolution_downscale=1)
    out, extra = refiner.refine_poses(preds, depth=depth_measured, K=K)
    assert extra["valid"][0]
    err_before = abs(T_pred[0, 3] - T_gt[0, 3])
    err_after = abs(out.poses[0, 0, 3] - T_gt[0, 3])
    assert err_after < err_before * 0.5, (err_before, err_after)
