"""DeepIM crop-box computation + bilinear box crops, pure JAX.

TPU-native re-design of the reference's `lib3d/cropping.py` (megapose6d:
src/megapose/lib3d/cropping.py:30-144). The reference crops with torchvision's
C++/CUDA `roi_align`; here cropping is a vectorized bilinear gather-resample
that XLA fuses into the surrounding jitted step, so observation crops never
leave the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import (
    boxes_from_uv,
    masked_boxes_from_uv,
    project_points_robust,
)

Array = jax.Array


def deepim_boxes(
    rend_center_uv: Array,
    obs_boxes: Array,
    rend_boxes: Array,
    lamb: float = 1.4,
    im_size: tuple[int, int] = (240, 320),
) -> Array:
    """Square-ish crop box enclosing both the observed box and the rendered
    box, centered on the projected reference point, with margin `lamb`
    (cropping.py:30-68). Aspect ratio fixed to `im_size`.

    Args:
      rend_center_uv: `[B, 2]` projection of the reference point.
      obs_boxes, rend_boxes: `[B, 4]`.
    Returns:
      `[B, 4]` (x1, y1, x2, y2), unclamped like the reference.
    """
    w = max(im_size)
    h = min(im_size)
    r = w / h
    xc = rend_center_uv[..., 0]
    yc = rend_center_uv[..., 1]

    xs = jnp.stack(
        [obs_boxes[..., 0], rend_boxes[..., 0], obs_boxes[..., 2], rend_boxes[..., 2]],
        axis=-1,
    )
    ys = jnp.stack(
        [obs_boxes[..., 1], rend_boxes[..., 1], obs_boxes[..., 3], rend_boxes[..., 3]],
        axis=-1,
    )
    xdist = jnp.max(jnp.abs(xs - xc[..., None]), axis=-1)
    ydist = jnp.max(jnp.abs(ys - yc[..., None]), axis=-1)
    width = jnp.maximum(xdist, ydist * r) * 2 * lamb
    height = jnp.maximum(xdist / r, ydist) * 2 * lamb
    return jnp.stack(
        [xc - width / 2, yc - height / 2, xc + width / 2, yc + height / 2],
        axis=-1,
    )


def crop_images(
    images: Array,
    boxes: Array,
    output_size: tuple[int, int],
    depth_dim: int | None = None,
) -> Array:
    """Bilinear crop+resize of NHWC images.

    XLA-native analog of torchvision `roi_align` as used in
    cropping.py:113-144 (one box per image, aligned sampling). For depth
    channels, interpolated pixels touching any invalid (<=0) source pixel are
    zeroed, matching the reference's depth-validity masking.

    Args:
      images: `[B, H, W, C]`.
      boxes: `[B, 4]` (x1, y1, x2, y2) in pixel coordinates.
      output_size: (out_h, out_w).
      depth_dim: channel index holding depth, or None.
    Returns:
      `[B, out_h, out_w, C]`.
    """
    B, H, W, C = images.shape
    out_h, out_w = output_size

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # jax.image.scale_and_translate maps input coordinate i to output
    # o = i * s + t; we want i = x1 + (o + 0.5) * (bw / out_w) - 0.5,
    # i.e. s = out_w / bw, t = s * (0.5 - x1) - 0.5. It lowers to
    # separable weight matmuls (MXU) — per-pixel gathers are slow on TPU.
    sx = out_w / jnp.maximum(x2 - x1, 1e-6)
    sy = out_h / jnp.maximum(y2 - y1, 1e-6)
    tx = sx * (0.5 - x1) - 0.5
    ty = sy * (0.5 - y1) - 0.5
    scale = jnp.stack([sy, sx], axis=-1)  # [B, 2] (h, w order)
    translation = jnp.stack([ty, tx], axis=-1)

    def sample_one(img, s, t):
        return jax.image.scale_and_translate(
            img,
            (out_h, out_w, C),
            spatial_dims=(0, 1),
            scale=s,
            translation=t,
            method="linear",
        )

    crops = jax.vmap(sample_one)(images, scale, translation)

    if depth_dim is not None:
        valid = (
            images[..., depth_dim : depth_dim + 1] > 0
        ).astype(images.dtype)

        def sample_valid(v, s, t):
            return jax.image.scale_and_translate(
                v, (out_h, out_w, 1), (0, 1), s, t, method="linear"
            )

        valid_crop = jax.vmap(sample_valid)(valid, scale, translation)
        mask = (valid_crop >= 0.99).astype(images.dtype)
        crops = crops.at[..., depth_dim : depth_dim + 1].multiply(mask)
    return crops


def deepim_crops_robust(
    images: Array,
    obs_boxes: Array,
    K: Array,
    TCO_pred: Array,
    tCR: Array,
    O_vertices: Array,
    output_size: tuple[int, int],
    lamb: float = 1.4,
    points_valid: Array | None = None,
    depth_dim: int | None = None,
    return_crops: bool = True,
) -> tuple[Array, Array | None]:
    """Crop observations around the projected hypothesis (cropping.py:84-110).

    `images` is NHWC. Returns (boxes `[B, 4]`, crops or None).
    """
    h, w = images.shape[1], images.shape[2]
    uv = project_points_robust(O_vertices, K, TCO_pred)
    if points_valid is not None:
        rend_boxes = masked_boxes_from_uv(uv, points_valid)
    else:
        rend_boxes = boxes_from_uv(uv)
    TCR = TCO_pred.at[..., :3, 3].set(tCR)
    center = project_points_robust(
        jnp.zeros_like(TCO_pred[..., :1, :3]), K, TCR
    )[..., 0, :]
    boxes = deepim_boxes(center, obs_boxes, rend_boxes, lamb=lamb, im_size=(h, w))
    crops = None
    if return_crops:
        crops = crop_images(images, boxes, output_size, depth_dim=depth_dim)
    return boxes, crops
