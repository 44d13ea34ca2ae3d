"""Pose losses: symmetric point-matching, disentangled refiner loss, ADD(-S).

TPU-native re-design of the reference's `lib3d/cosypose_ops.py:61-146`,
`lib3d/mesh_losses.py` and `lib3d/distances.py`. Fully batched / vmappable;
symmetry sets are padded to a static size with a validity mask.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ._precision import einsum, matmul

from .pose_init import pose_update_with_reference_point
from .se3 import rotmat_from_ortho6d, transform_pts

Array = jax.Array

l1: Callable[[Array], Array] = lambda d: jnp.abs(d)
l2: Callable[[Array], Array] = lambda d: d**2


def loss_CO_symmetric(
    TCO_possible_gt: Array,
    TCO_pred: Array,
    points: Array,
    l1_or_l2: Callable[[Array], Array] = l1,
    sym_valid: Array | None = None,
    points_valid: Array | None = None,
) -> tuple[Array, Array]:
    """Min-over-symmetries point-matching loss (cosypose_ops.py:61-75).

    Args:
      TCO_possible_gt: `[B, S, 4, 4]` GT pose composed with each symmetry.
      TCO_pred: `[B, 4, 4]`.
      points: `[B, N, 3]`.
      sym_valid: `[B, S]` mask for padded symmetry slots.
      points_valid: `[B, N]` mask for padded points.
    Returns:
      (loss `[B]`, TCO_assign `[B, 4, 4]` — the best-matching GT pose).
    """
    gt_pts = transform_pts(TCO_possible_gt, points)  # [B, S, N, 3]
    pred_pts = transform_pts(TCO_pred, points)  # [B, N, 3]
    diff = l1_or_l2(pred_pts[..., None, :, :] - gt_pts)  # [B, S, N, 3]
    if points_valid is not None:
        w = points_valid[..., None, :, None].astype(diff.dtype)
        losses = (diff * w).sum((-1, -2)) / jnp.maximum(
            w.sum((-1, -2)) * 3, 1.0
        )
    else:
        losses = diff.mean((-1, -2))  # [B, S]
    if sym_valid is not None:
        big = jnp.asarray(jnp.finfo(losses.dtype).max, losses.dtype)
        losses = jnp.where(sym_valid, losses, big)
    min_id = jnp.argmin(losses, axis=-1)
    loss = jnp.take_along_axis(losses, min_id[..., None], axis=-1)[..., 0]
    TCO_assign = jnp.take_along_axis(
        TCO_possible_gt, min_id[..., None, None, None], axis=-3
    )[..., 0, :, :]
    return loss, TCO_assign


def loss_refiner_CO_disentangled_reference_point(
    TCO_possible_gt: Array,
    TCO_input: Array,
    refiner_outputs: Array,
    K_crop: Array,
    points: Array,
    tCR: Array,
    sym_valid: Array | None = None,
    points_valid: Array | None = None,
) -> tuple[Array, dict[str, Array]]:
    """Disentangled DeepIM refiner loss about a reference point
    (cosypose_ops.py:78-146): rotation / xy / z components of the 9D output
    are each evaluated with the other two replaced by their GT values.

    Args:
      TCO_possible_gt: `[B, S, 4, 4]` (slot 0 = canonical GT).
      TCO_input: `[B, 4, 4]` input pose of the iteration.
      refiner_outputs: `[B, 9]` network output.
      K_crop: `[B, 3, 3]`.
      points: `[B, N, 3]`.
      tCR: `[B, 3]`.
    Returns:
      (loss `[B]`, dict of per-term losses).
    """
    dR = rotmat_from_ortho6d(refiner_outputs[..., 0:6])
    vxvy = refiner_outputs[..., 6:8]
    vz = refiner_outputs[..., 8:9]
    TCO_gt = TCO_possible_gt[..., 0, :, :]
    fxfy = jnp.stack([K_crop[..., 0, 0], K_crop[..., 1, 1]], axis=-1)

    R_in_T = jnp.swapaxes(TCO_input[..., :3, :3], -2, -1)
    dR_gt = matmul(TCO_gt[..., :3, :3], R_in_T)
    tCO_gt = TCO_gt[..., :3, 3]
    tCR_out_gt = tCO_gt - einsum(
        "...ij,...j->...i", dR_gt, TCO_input[..., :3, 3] - tCR
    )

    vz_gt = tCR_out_gt[..., 2:3] / tCR[..., 2:3]
    vxvy_gt = fxfy * (
        tCR_out_gt[..., 0:2] / tCR_out_gt[..., 2:3]
        - tCR[..., 0:2] / tCR[..., 2:3]
    )

    def update(vxvy_, vz_, dR_):
        return pose_update_with_reference_point(
            TCO_input, K_crop, jnp.concatenate([vxvy_, vz_], -1), dR_, tCR
        )

    # Term 1: predicted rotation, GT translation components.
    T_orn = update(vxvy_gt, vz_gt, dR)
    TCO_pred_orn = TCO_gt.at[..., :3, :3].set(T_orn[..., :3, :3])
    # Term 2: predicted vxvy only.
    T_xy = update(vxvy, vz_gt, dR_gt)
    TCO_pred_xy = TCO_gt.at[..., :2, 3].set(T_xy[..., :2, 3])
    # Term 3: predicted vz only.
    T_z = update(vxvy_gt, vz, dR_gt)
    TCO_pred_z = TCO_gt.at[..., 2, 3].set(T_z[..., 2, 3])

    kw = dict(sym_valid=sym_valid, points_valid=points_valid, l1_or_l2=l1)
    loss_orn, _ = loss_CO_symmetric(TCO_possible_gt, TCO_pred_orn, points, **kw)
    loss_xy, _ = loss_CO_symmetric(TCO_possible_gt, TCO_pred_xy, points, **kw)
    loss_z, _ = loss_CO_symmetric(TCO_possible_gt, TCO_pred_z, points, **kw)

    loss = loss_orn + loss_xy + loss_z
    return loss, {
        "loss_orn": loss_orn,
        "loss_xy": loss_xy,
        "loss_z": loss_z,
        "loss": loss,
    }


def dists_add(TCO_pred: Array, TCO_gt: Array, points: Array) -> Array:
    """Per-point ADD displacement vectors (lib3d/distances.py:26-41).

    Returns `[B, N, 3]`."""
    return transform_pts(TCO_pred, points) - transform_pts(TCO_gt, points)


def dists_add_symmetric(
    TCO_pred: Array, TCO_gt: Array, points: Array
) -> Array:
    """ADD-S: per predicted point, displacement to the *nearest* GT point
    (lib3d/distances.py:44-50). Returns `[B, N, 3]`."""
    pred = transform_pts(TCO_pred, points)
    gt = transform_pts(TCO_gt, points)
    d2 = jnp.sum((pred[..., :, None, :] - gt[..., None, :, :]) ** 2, -1)
    nn = jnp.argmin(d2, axis=-1)  # [B, N]
    gt_nn = jnp.take_along_axis(gt, nn[..., None], axis=-2)
    return pred - gt_nn


def compute_ADD_L1_loss(TCO_pred: Array, TCO_gt: Array, points: Array) -> Array:
    """Mean L1 ADD loss (lib3d/mesh_losses.py:42-49). Returns `[B]`."""
    return jnp.abs(dists_add(TCO_pred, TCO_gt, points)).mean((-1, -2))
