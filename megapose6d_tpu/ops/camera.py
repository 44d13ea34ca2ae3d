"""Pinhole-camera geometry, pure JAX.

TPU-native re-design of the reference's `lib3d/camera_geometry.py`
(megapose6d: src/megapose/lib3d/camera_geometry.py:26-126). Everything is
batched and jit-friendly; used inside the fused crop+render+score step.

Conventions: `K [..., 3, 3]` OpenCV intrinsics, `TCO [..., 4, 4]` camera<-object,
pixel coordinates (u, v) with u ~ x ~ column, v ~ y ~ row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ._precision import einsum, matmul

Array = jax.Array


def project_points(points_3d: Array, K: Array, TCO: Array) -> Array:
    """Project object-frame points to pixels (camera_geometry.py:26-37).

    Args:
      points_3d: `[B, N, 3]`.
      K: `[B, 3, 3]`.
      TCO: `[B, 4, 4]`.
    Returns:
      uv `[B, N, 2]`.
    """
    P = matmul(K, TCO[..., :3, :])  # [B, 3, 4]
    pts_h = jnp.concatenate(
        [points_3d, jnp.ones_like(points_3d[..., :1])], axis=-1
    )
    suv = einsum("...ij,...nj->...ni", P, pts_h)
    return suv[..., :2] / suv[..., 2:3]


def project_points_robust(
    points_3d: Array, K: Array, TCO: Array, z_min: float = 0.1
) -> Array:
    """Projection with z clamped to `z_min` to avoid NaN blowups for
    hypotheses behind / near the camera (camera_geometry.py:40-53)."""
    P = matmul(K, TCO[..., :3, :])
    pts_h = jnp.concatenate(
        [points_3d, jnp.ones_like(points_3d[..., :1])], axis=-1
    )
    suv = einsum("...ij,...nj->...ni", P, pts_h)
    z = jnp.maximum(suv[..., 2:3], z_min)
    return suv[..., :2] / z


def boxes_from_uv(uv: Array) -> Array:
    """Tight (x1, y1, x2, y2) box around projected points
    (camera_geometry.py:56-64). `uv: [B, N, 2]` -> `[B, 4]`."""
    mins = jnp.min(uv, axis=-2)
    maxs = jnp.max(uv, axis=-2)
    return jnp.concatenate([mins, maxs], axis=-1)


def masked_boxes_from_uv(uv: Array, valid: Array) -> Array:
    """Like `boxes_from_uv` but ignoring padded points (`valid [B, N]` bool).

    Needed because our mesh database pads point sets to a static size; the
    reference instead carries ragged tensors (rigid_mesh_database.py:172-200).
    """
    big = jnp.asarray(jnp.finfo(uv.dtype).max, uv.dtype)
    v = valid[..., None]
    mins = jnp.min(jnp.where(v, uv, big), axis=-2)
    maxs = jnp.max(jnp.where(v, uv, -big), axis=-2)
    return jnp.concatenate([mins, maxs], axis=-1)


def get_K_crop_resize(
    K: Array,
    boxes: Array,
    orig_size: tuple[int, int],
    crop_resize: tuple[int, int],
) -> Array:
    """Update intrinsics for a crop defined by `boxes` followed by a resize to
    `crop_resize` (camera_geometry.py:67-126; skew unhandled there too).

    Args:
      K: `[B, 3, 3]`.
      boxes: `[B, 4]` (x1, y1, x2, y2) in the original image.
      orig_size: (h, w) of the original image (unused, kept for API parity).
      crop_resize: (h, w) of the output crop.
    Returns:
      `[B, 3, 3]` intrinsics of the cropped+resized view.
    """
    del orig_size
    final_height, final_width = min(crop_resize), max(crop_resize)
    crop_width = boxes[..., 2] - boxes[..., 0]
    crop_height = boxes[..., 3] - boxes[..., 1]
    crop_cj = (boxes[..., 0] + boxes[..., 2]) / 2
    crop_ci = (boxes[..., 1] + boxes[..., 3]) / 2

    # Principal point after cropping (pixel-center convention).
    cx = K[..., 0, 2] + (crop_width - 1) / 2 - crop_cj
    cy = K[..., 1, 2] + (crop_height - 1) / 2 - crop_ci

    scale_x = final_width / crop_width
    scale_y = final_height / crop_height
    cx = (final_width - 1) / 2 + scale_x * (cx - (crop_width - 1) / 2)
    cy = (final_height - 1) / 2 + scale_y * (cy - (crop_height - 1) / 2)

    new_K = K
    new_K = new_K.at[..., 0, 0].set(scale_x * K[..., 0, 0])
    new_K = new_K.at[..., 1, 1].set(scale_y * K[..., 1, 1])
    new_K = new_K.at[..., 0, 2].set(cx)
    new_K = new_K.at[..., 1, 2].set(cy)
    return new_K


def get_K_resize(
    K: Array, orig_size: tuple[int, int], new_size: tuple[int, int]
) -> Array:
    """Update intrinsics for a whole-image resize `orig_size -> new_size`
    (both (h, w)); pixel-center convention, consistent with
    `get_K_crop_resize` (crop == the full image) and with half-pixel-center
    image resampling (`jax.image.resize`): fx' = s*fx, cx' = s*(cx+0.5)-0.5.

    Used by the coarse-stage low-resolution render path
    (`PosePredictorConfig.render_at`): the same pose projects to the same
    relative pixel position at the reduced raster size."""
    sy = new_size[0] / orig_size[0]
    sx = new_size[1] / orig_size[1]
    new_K = K
    new_K = new_K.at[..., 0, 0].set(sx * K[..., 0, 0])
    new_K = new_K.at[..., 1, 1].set(sy * K[..., 1, 1])
    new_K = new_K.at[..., 0, 2].set(sx * (K[..., 0, 2] + 0.5) - 0.5)
    new_K = new_K.at[..., 1, 2].set(sy * (K[..., 1, 2] + 0.5) - 0.5)
    return new_K


def look_at_R(eye: Array, target: Array, up_hint: Array, eps: float = 1e-9) -> Array:
    """Rotation `R_WC` of a CV camera at `eye` looking at `target`.

    CV convention: camera +Z is the viewing direction, +Y points down, so the
    world-frame "up" hint aligns with -Y. This replaces the reference's use of
    Panda3D `NodePath.lookAt` scene-graph math (lib3d/multiview.py:31-92) with
    pure batched linear algebra.

    Args:
      eye, target, up_hint: `[..., 3]`.
    Returns:
      `[..., 3, 3]` with columns = camera axes expressed in world frame.
    """
    fwd = target - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd, axis=-1, keepdims=True), eps)
    down = -up_hint
    x = jnp.cross(down, fwd)
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    # Degenerate (forward parallel to up): fall back to an arbitrary axis.
    fallback = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], fwd.dtype), fwd.shape
    )
    x = jnp.where(x_norm < eps, fallback, x / jnp.maximum(x_norm, eps))
    y = jnp.cross(fwd, x)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return jnp.stack([x, y, fwd], axis=-1)
