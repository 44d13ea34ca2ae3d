"""Pose-hypothesis initialization from 2D boxes + SE(3) pose updates.

TPU-native re-design of the reference's `lib3d/cosypose_ops.py`
(megapose6d: src/megapose/lib3d/cosypose_ops.py:33-258). All functions are
batched, jit-friendly, and support padded point sets via a `valid` mask
(the reference uses ragged per-mesh tensors instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ._precision import einsum, matmul

from .se3 import make_se3, transform_pts

Array = jax.Array

# Canonical "z-up" seed orientation used by the BOP20-challenge initializers
# (cosypose_ops.py:190-196): object z-axis up, camera looking at it.
# numpy, not jnp: a module-scope device array would initialize the XLA
# backend at import time (breaking jax.distributed.initialize ordering).
import numpy as _np

_ZUP_R = _np.asarray(
    [[0.0, 1.0, 0.0], [0.0, 0.0, -1.0], [-1.0, 0.0, 0.0]], _np.float32
)


def _masked_extent(pts_cam: Array, valid: Array | None, axis_idx: int) -> Array:
    """max - min of `pts_cam[..., axis_idx]` over points, honoring a mask."""
    x = pts_cam[..., axis_idx]
    if valid is None:
        return jnp.max(x, axis=-1) - jnp.min(x, axis=-1)
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    return jnp.max(jnp.where(valid, x, -big), axis=-1) - jnp.min(
        jnp.where(valid, x, big), axis=-1
    )


def tco_init_from_boxes_autodepth_with_R(
    boxes_2d: Array,
    model_points_3d: Array,
    K: Array,
    R: Array,
    valid: Array | None = None,
    z_guess: float = 1.0,
) -> Array:
    """Initial pose from a detection box, with depth chosen so the projected
    mesh extent matches the box extent (cosypose_ops.py:169-218).

    Args:
      boxes_2d: `[B, 4]` (x1, y1, x2, y2).
      model_points_3d: `[B, N, 3]` object-frame points (padded ok).
      K: `[B, 3, 3]`.
      R: `[B, 3, 3]` rotation hypothesis (e.g. from the SO(3) grid).
      valid: `[B, N]` bool mask for padded points.
    Returns:
      TCO `[B, 4, 4]`.
    """
    fxfy = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    cxcy = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    centers = (boxes_2d[..., 0:2] + boxes_2d[..., 2:4]) / 2

    xy_init = (centers - cxcy) * z_guess / fxfy
    t0 = jnp.concatenate(
        [xy_init, jnp.full_like(xy_init[..., :1], z_guess)], axis=-1
    )
    TCO = make_se3(R, t0)

    pts_cam = transform_pts(TCO, model_points_3d)
    deltax_3d = _masked_extent(pts_cam, valid, 0)
    deltay_3d = _masked_extent(pts_cam, valid, 1)

    bb_dx = boxes_2d[..., 2] - boxes_2d[..., 0] + 1
    bb_dy = boxes_2d[..., 3] - boxes_2d[..., 1] + 1
    z_from_dx = fxfy[..., 0] * deltax_3d / bb_dx
    z_from_dy = fxfy[..., 1] * deltay_3d / bb_dy
    z = (z_from_dx + z_from_dy) / 2

    xy = (centers - cxcy) * z[..., None] / fxfy
    t = jnp.concatenate([xy, z[..., None]], axis=-1)
    return make_se3(R, t)


def tco_init_from_boxes_zup_autodepth(
    boxes_2d: Array,
    model_points_3d: Array,
    K: Array,
    valid: Array | None = None,
) -> Array:
    """Z-up variant used for the coarse model's canonical seed
    (cosypose_ops.py:221-258)."""
    R = jnp.broadcast_to(
        _ZUP_R.astype(boxes_2d.dtype), boxes_2d.shape[:-1] + (3, 3)
    )
    return tco_init_from_boxes_autodepth_with_R(
        boxes_2d, model_points_3d, K, R, valid=valid
    )


def pose_update_with_reference_point(
    TCO: Array, K: Array, vxvyvz: Array, dRCO: Array, tCR: Array
) -> Array:
    """Apply the network's 9D output as an SE(3) update about the reference
    point `tCR` (cosypose_ops.py:33-58).

    vz scales the reference depth; (vx, vy) move the reference point in
    normalized image coordinates; dRCO left-multiplies the rotation.

    Args:
      TCO: `[B, 4, 4]` input pose.
      K: `[B, 3, 3]` crop intrinsics.
      vxvyvz: `[B, 3]`.
      dRCO: `[B, 3, 3]`.
      tCR: `[B, 3]` reference point in camera frame.
    Returns:
      `[B, 4, 4]` updated pose.
    """
    # Guard against degenerate depths (untrained heads emit vz ~ 0; the
    # reference relies on training to keep z sane, we additionally clamp —
    # same spirit as project_points_robust's z_min).
    zsrc = tCR[..., 2:3]
    zsrc = jnp.where(jnp.abs(zsrc) < 1e-4, 1e-4, zsrc)
    vz = vxvyvz[..., 2:3]
    ztgt = jnp.clip(vz * zsrc, 1e-4, 1e4)

    vxvy = vxvyvz[..., 0:2]
    fxfy = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    xsrcysrc = tCR[..., 0:2]
    tCR_out_xy = (vxvy / fxfy + xsrcysrc / zsrc) * ztgt
    tCR_out = jnp.concatenate([tCR_out_xy, ztgt], axis=-1)

    tCO_out = (
        einsum("...ij,...j->...i", dRCO, TCO[..., :3, 3] - tCR) + tCR_out
    )
    R_out = matmul(dRCO, TCO[..., :3, :3])
    return make_se3(R_out, tCO_out)
