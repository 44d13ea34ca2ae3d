"""GNC-TLS robust registration + FPS (TeaserppRefiner analog,
reference inference/teaserpp_refiner.py:53-289)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megapose6d_tpu.ops.registration import (
    gnc_tls_registration,
    kabsch,
    sample_farthest_points,
)
from megapose6d_tpu.ops.se3 import make_se3, rotmat_from_quat


def random_transform(seed, angle_deg=20.0, trans=0.05):
    rng = np.random.RandomState(seed)
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    a = np.radians(angle_deg)
    q = np.concatenate([np.sin(a / 2) * axis, [np.cos(a / 2)]])
    R = np.asarray(rotmat_from_quat(jnp.asarray(q[None], jnp.float32)))[0]
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = rng.randn(3) * trans
    return T


def test_kabsch_exact():
    rng = np.random.RandomState(0)
    src = rng.randn(50, 3).astype(np.float32)
    T = random_transform(1)
    tgt = src @ T[:3, :3].T + T[:3, 3]
    T_est = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(tgt),
                              jnp.ones(50)))
    np.testing.assert_allclose(T_est, T, atol=1e-5)


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
def test_gnc_tls_with_outliers(outlier_frac):
    rng = np.random.RandomState(2)
    N = 300
    src = rng.randn(N, 3).astype(np.float32) * 0.1
    T = random_transform(3, angle_deg=25.0, trans=0.08)
    tgt = src @ T[:3, :3].T + T[:3, 3]
    tgt += rng.randn(N, 3).astype(np.float32) * 0.001  # inlier noise
    n_out = int(N * outlier_frac)
    tgt[:n_out] += rng.randn(n_out, 3).astype(np.float32) * 0.3  # outliers

    res = jax.jit(
        lambda s, t, v: gnc_tls_registration(s, t, v, noise_bound=0.005)
    )(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(N, bool))
    T_est = np.asarray(res.T_tgt_src)
    assert bool(res.valid)
    # Rotation within 1 degree, translation within 2 mm.
    dR = T_est[:3, :3] @ T[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, (outlier_frac, ang)
    assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 2e-3
    # Outliers identified.
    assert int(res.n_inliers) >= N - n_out - 10


def test_gnc_too_few_points_invalid():
    src = jnp.zeros((10, 3))
    tgt = jnp.ones((10, 3))
    res = gnc_tls_registration(src, tgt, jnp.zeros(10, bool))
    assert not bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.T_tgt_src), np.eye(4))


def test_gnc_nan_points_are_dropped():
    """NaN coordinates (masked-out depth pixels) must not reach the
    weighted Kabsch sums: the kabsch weights are w0 + 1e-9, so even
    zero-weight slots poisoned the centroid through 1e-9 * NaN = NaN."""
    rng = np.random.RandomState(5)
    N = 200
    src = rng.randn(N, 3).astype(np.float32) * 0.1
    T = random_transform(6, angle_deg=15.0, trans=0.05)
    tgt = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    valid = np.ones(N, bool)
    # NaN in invalid slots AND in a few valid-flagged slots.
    src[:5] = np.nan
    valid[:5] = False
    tgt[5:8] = np.nan  # flagged valid; must be dropped by the finite mask
    res = gnc_tls_registration(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid),
        noise_bound=0.005,
    )
    T_est = np.asarray(res.T_tgt_src)
    assert np.isfinite(T_est).all()
    assert bool(res.valid)
    np.testing.assert_allclose(T_est, T, atol=1e-3)


def test_fps_spreads_points():
    rng = np.random.RandomState(4)
    # Two well-separated clusters; FPS must pick from both immediately.
    a = rng.randn(100, 3).astype(np.float32) * 0.01
    b = a + 10.0
    pts = jnp.asarray(np.concatenate([a, b]))
    idx = np.asarray(sample_farthest_points(pts, 8))
    assert len(np.unique(idx)) == 8
    picked = np.asarray(pts)[idx]
    # Both clusters represented among the first two picks.
    sides = picked[:, 0] > 5.0
    assert sides[:2].sum() == 1


def test_fps_respects_valid_mask():
    pts = jnp.asarray(np.random.RandomState(5).randn(64, 3), jnp.float32)
    valid = jnp.arange(64) < 16
    idx = np.asarray(sample_farthest_points(pts, 8, valid=valid))
    assert (idx < 16).all()


@pytest.mark.slow
def test_gnc_refiner_end_to_end():
    """Perturbed pose -> rendered-vs-measured depth registration recovers
    the pose (the TeaserppRefiner pipeline shape)."""
    from megapose6d_tpu.data.tensor_collection import PandasTensorCollection
    from megapose6d_tpu.inference.depth_refiner import GNCRegistrationRefiner
    from megapose6d_tpu.meshes import (
        MeshDataBase, RigidObject, RigidObjectDataset, make_cube,
    )
    from megapose6d_tpu.ops import rasterizer
    import pandas as pd

    objs = RigidObjectDataset([RigidObject(label="cube", mesh=make_cube(0.04))])
    db = MeshDataBase.from_object_ds(
        objs, max_faces=64, n_points=64, n_sym=2
    ).batched(align=8)
    K = np.asarray([[120.0, 0, 40], [0, 120.0, 30], [0, 0, 1]], np.float32)
    TCO_gt = np.eye(4, dtype=np.float32)
    TCO_gt[2, 3] = 0.4
    m = db.select(jnp.zeros((1,), jnp.int32))
    depth_gt = rasterizer.render_meshes(
        m.vertices, m.normals, m.colors, m.faces, m.face_valid,
        jnp.asarray(TCO_gt)[None], jnp.asarray(K)[None], (60, 80), chunk=64,
    ).depth[0]

    TCO_bad = TCO_gt.copy()
    TCO_bad[:3, 3] += [0.004, -0.003, 0.015]
    preds = PandasTensorCollection(
        pd.DataFrame({"label": ["cube"]}), poses=TCO_bad[None]
    )
    ref = GNCRegistrationRefiner(
        db, n_points=256, noise_bound=0.01, resolution_downscale=1
    )
    out, extra = ref.refine_poses(preds, depth=np.asarray(depth_gt), K=K)
    err0 = np.linalg.norm(TCO_bad[:3, 3] - TCO_gt[:3, 3])
    err1 = np.linalg.norm(out.poses[0][:3, 3] - TCO_gt[:3, 3])
    assert bool(extra["valid"][0])
    assert err1 < err0 * 0.5, (err0, err1)
