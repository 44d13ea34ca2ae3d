"""Visible Surface Discrepancy (VSD), in-tree via the on-device renderer.

The third BOP19 pose error (with MSSD/MSPD, meters.py). The reference can
only score VSD through the bop_toolkit C++-renderer subprocess
(megapose6d: src/megapose/evaluation/bop.py:140-176); here the distance
maps come from the same rasterizer the pipeline uses, so the whole BOP19
AR triple is computable on-device.

Definition (bop_toolkit `pose_error.vsd`, BOP19 settings):
  - render object distance maps for the estimated and GT poses,
  - visibility masks: object pixels whose rendered distance is within
    `delta` (15 mm) in front of the measured scene depth,
  - e_VSD(tau) = mean over the union of visibility masks of
      1[ pixel not in both masks  OR  |d_est - d_gt| > tau ],
  - recall = fraction of estimates with e_VSD < theta, averaged over the
    grid theta in {0.05..0.5}, tau in {5%..50%} of the object diameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rasterizer_tiled

Array = jax.Array

BOP19_VSD_DELTA = 0.015  # meters
BOP19_VSD_TAUS = tuple(np.arange(0.05, 0.51, 0.05))  # x diameter
BOP19_THRESHOLDS = tuple(np.arange(0.05, 0.51, 0.05))


def render_distance_maps(meshes, TCO: Array, K: Array, resolution) -> Array:
    """Euclidean distance maps (bop_toolkit uses distance, not plain z):
    d(u, v) = z * |K^-1 (u, v, 1)|."""
    out = rasterizer_tiled.render_meshes_tiled(
        meshes.vertices, meshes.normals, meshes.colors, meshes.faces,
        meshes.face_valid, TCO, K, resolution,
        interpret=jax.default_backend() == "cpu",
    )
    H, W = resolution
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    ray = jnp.sqrt(
        1.0
        + ((u[None] - cx[:, None, None]) / fx[:, None, None]) ** 2
        + ((v[None] - cy[:, None, None]) / fy[:, None, None]) ** 2
    )  # [N, H, W]
    return out.depth * ray


def depth_to_distance(depth: Array, K: Array) -> Array:
    """Measured z-depth image -> distance image. depth [H, W], K [3, 3]."""
    H, W = depth.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    ray = jnp.sqrt(
        1.0 + ((u - K[0, 2]) / K[0, 0]) ** 2 + ((v - K[1, 2]) / K[1, 1]) ** 2
    )
    return depth * ray


def compute_vsd(
    depth_measured: Array,  # [H, W] meters (z-depth)
    TCO_pred: Array,  # [N, 4, 4]
    TCO_gt: Array,  # [N, 4, 4]
    K: Array,  # [3, 3]
    meshes,  # selected BatchedMeshes, leading dim N
    diameters: Array,  # [N]
    taus=BOP19_VSD_TAUS,
    delta: float = BOP19_VSD_DELTA,
) -> np.ndarray:
    """e_VSD per estimate per tau. Returns `[N, n_taus]`."""
    N = TCO_pred.shape[0]
    resolution = depth_measured.shape
    K_b = jnp.broadcast_to(jnp.asarray(K, jnp.float32), (N, 3, 3))
    dist_est = render_distance_maps(
        meshes, jnp.asarray(TCO_pred, jnp.float32), K_b, resolution
    )
    dist_gt = render_distance_maps(
        meshes, jnp.asarray(TCO_gt, jnp.float32), K_b, resolution
    )
    dist_meas = depth_to_distance(
        jnp.asarray(depth_measured, jnp.float32), jnp.asarray(K, jnp.float32)
    )[None]  # [1, H, W]

    meas_valid = dist_meas > 0
    # Visibility: rendered surface not occluded by the measured scene
    # (within delta in front of it), or measured depth missing there
    # (bop_toolkit visibility.estimate_visib_mask_gt with the BOP19
    # 'step' cost uses measured-valid pixels; missing depth counts
    # visible for the GT mask union here — documented deviation kept
    # simple and symmetric).
    def visib(dist_r):
        hit = dist_r > 0
        return hit & (
            (dist_r < dist_meas + delta) | ~meas_valid
        )

    v_est = visib(dist_est)
    v_gt = visib(dist_gt)
    union = v_est | v_gt
    both = v_est & v_gt
    d_diff = jnp.abs(dist_est - dist_gt)

    n_union = jnp.maximum(union.sum(axis=(1, 2)), 1)  # [N]
    errs = []
    for tau in taus:
        tau_n = jnp.asarray(tau, jnp.float32) * jnp.asarray(
            diameters, jnp.float32
        )[:, None, None]
        bad = union & (~both | (d_diff > tau_n))
        e = bad.sum(axis=(1, 2)) / n_union
        # No visible surface at all -> error 1 (object fully occluded).
        e = jnp.where(union.sum(axis=(1, 2)) == 0, 1.0, e)
        errs.append(e)
    return np.asarray(jnp.stack(errs, axis=-1))


def vsd_recall(e_vsd: np.ndarray, thresholds=BOP19_THRESHOLDS) -> float:
    """AR_VSD: mean over (tau, theta) grid of 1[e_VSD(tau) < theta]."""
    e = np.asarray(e_vsd)  # [N, n_taus]
    recalls = [
        (e < th).mean() for th in thresholds
    ]
    return float(np.mean(recalls))
