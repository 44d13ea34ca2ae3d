"""Object detector: anchor-free heatmap network + Detector wrapper.

The reference wraps torchvision's Mask R-CNN (megapose6d:
src/megapose/models/mask_rcnn.py:24-45) — a two-stage, dynamic-shape
detector that maps poorly onto XLA's static-shape compilation. The
TPU-native counterpart is a CenterNet-style anchor-free head (per-class
center heatmap + box size + offset regression on a ResNet trunk): single
dense forward, static shapes, top-K peak decoding — everything jits.

The `Detector` wrapper reproduces the reference's post-processing contract
(inference/detector.py:64-139): score threshold, optional
one-instance-per-class, label remapping, `DetectionsType` output.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.tensor_collection import PandasTensorCollection
from .backbones import BasicBlock

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    n_classes: int = 1
    width: int = 32
    stride: int = 4  # output stride of the heatmap
    max_detections: int = 32
    compute_dtype: str = "float32"
    # Instance masks (reference capability: DetectorMaskRCNN,
    # models/mask_rcnn.py:24-45, masks consumed by the RGBD depth-refiner
    # path). CenterNet-style: a per-class segmentation head at heatmap
    # stride; per-instance masks = the class channel cropped to the
    # detection box.
    predict_masks: bool = False


class CenterNetDetector(nn.Module):
    """ResNet-lite trunk -> center heatmap [B, H/s, W/s, C], box sizes and
    center offsets."""

    cfg: DetectorConfig

    @nn.compact
    def __call__(self, images: Array) -> dict[str, Array]:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        x = images.astype(dtype)
        w = c.width
        x = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=8, dtype=dtype)(x))
        x = BasicBlock(w, strides=2, norm_groups=8, dtype=dtype)(x)
        x = BasicBlock(w * 2, strides=2, norm_groups=8, dtype=dtype)(x)
        x = BasicBlock(w * 4, strides=2, norm_groups=8, dtype=dtype)(x)
        # Upsample back to stride `c.stride` (transpose convs).
        n_up = {4: 2, 8: 1, 16: 0}[c.stride]
        for _ in range(n_up):
            x = nn.ConvTranspose(
                w * 2, (4, 4), strides=(2, 2), dtype=dtype
            )(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, dtype=dtype)(x))
        heat = nn.Conv(c.n_classes, (3, 3), padding=1, dtype=dtype)(x)
        wh = nn.Conv(2, (3, 3), padding=1, dtype=dtype)(x)
        off = nn.Conv(2, (3, 3), padding=1, dtype=dtype)(x)
        out = {
            "heatmap": heat.astype(jnp.float32),
            "wh": jax.nn.softplus(wh.astype(jnp.float32)),
            "offset": off.astype(jnp.float32),
        }
        if c.predict_masks:
            seg = nn.Conv(c.n_classes, (3, 3), padding=1, dtype=dtype)(x)
            out["seg"] = seg.astype(jnp.float32)
        return out


def decode_detections(
    outputs: dict[str, Array], stride: int, top_k: int
) -> dict[str, Array]:
    """Peak-NMS (3x3 max-pool equality) + top-K decode.

    Returns boxes [B, K, 4] xyxy (input-pixel coords), scores [B, K],
    class ids [B, K].
    """
    heat = jax.nn.sigmoid(outputs["heatmap"])  # [B, h, w, C]
    B, h, w, C = heat.shape
    pooled = nn.max_pool(
        heat, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
    )
    peaks = jnp.where(heat == pooled, heat, 0.0)
    flat = peaks.reshape(B, h * w * C)
    scores, idx = jax.lax.top_k(flat, top_k)  # [B, K]
    cls = (idx % C).astype(jnp.int32)
    pix = idx // C
    ys = (pix // w).astype(jnp.float32)
    xs = (pix % w).astype(jnp.float32)

    def take_map(m):  # [B, h, w, 2] -> [B, K, 2]
        flat_m = m.reshape(B, h * w, 2)
        return jnp.take_along_axis(flat_m, (pix)[..., None], axis=1)

    off = take_map(outputs["offset"])
    wh = take_map(outputs["wh"])
    cx = (xs + off[..., 0]) * stride
    cy = (ys + off[..., 1]) * stride
    bw = wh[..., 0] * stride
    bh = wh[..., 1] * stride
    boxes = jnp.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
    )
    return {"boxes": boxes, "scores": scores, "classes": cls}


def detection_loss(
    outputs: dict[str, Array],
    gt_boxes: Array,  # [B, N, 4] xyxy
    gt_classes: Array,  # [B, N] i32
    gt_valid: Array,  # [B, N] bool
    stride: int,
    focal_alpha: float = 2.0,
    focal_beta: float = 4.0,
) -> tuple[Array, dict[str, Array]]:
    """CenterNet focal heatmap loss + L1 size/offset at GT centers."""
    heat = outputs["heatmap"]
    B, h, w, C = heat.shape
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2 / stride
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2 / stride
    bw = (gt_boxes[..., 2] - gt_boxes[..., 0]) / stride
    bh = (gt_boxes[..., 3] - gt_boxes[..., 1]) / stride
    ix = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(cy.astype(jnp.int32), 0, h - 1)

    # Gaussian target heatmap, splatted at the INTEGER center cell (standard
    # CenterNet draw_gaussian) so the peak cell is exactly 1 and the focal
    # positives below are never empty for in-bounds objects.
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    sigma = jnp.maximum(jnp.sqrt(bw * bh) / 3.0, 1.0)  # [B, N]
    fy = iy.astype(jnp.float32)
    fx = ix.astype(jnp.float32)
    d2 = (ys[None, None] - fy[..., None, None]) ** 2 + (
        xs[None, None] - fx[..., None, None]
    ) ** 2
    g = jnp.exp(-d2 / (2 * sigma[..., None, None] ** 2))  # [B, N, h, w]
    g = jnp.where(gt_valid[..., None, None], g, 0.0)
    onehot = jax.nn.one_hot(gt_classes, C)  # [B, N, C]
    # max (not sum) over instances: overlapping gaussians must not create
    # spurious peak-valued cells away from any true center.
    target = jnp.max(
        g[..., None] * onehot[:, :, None, None, :], axis=1
    )  # [B, h, w, C]

    p = jax.nn.sigmoid(heat)
    pos = (target > 0.999).astype(jnp.float32)
    pos_loss = -pos * ((1 - p) ** focal_alpha) * jnp.log(
        jnp.maximum(p, 1e-6)
    )
    neg_loss = (
        -(1 - pos)
        * ((1 - target) ** focal_beta)
        * (p**focal_alpha)
        * jnp.log(jnp.maximum(1 - p, 1e-6))
    )
    n_pos = jnp.maximum(pos.sum(), 1.0)
    heat_loss = (pos_loss.sum() + neg_loss.sum()) / n_pos

    # Size/offset regression at GT centers.
    def at_centers(m):  # [B, h, w, 2]
        flat = m.reshape(B, h * w, 2)
        pix = iy * w + ix
        return jnp.take_along_axis(flat, pix[..., None], axis=1)

    wh_pred = at_centers(outputs["wh"])
    off_pred = at_centers(outputs["offset"])
    vw = gt_valid.astype(jnp.float32)[..., None]
    wh_gt = jnp.stack([bw, bh], -1)
    off_gt = jnp.stack([cx - ix, cy - iy], -1)
    n_valid = jnp.maximum(vw.sum(), 1.0)
    wh_loss = (jnp.abs(wh_pred - wh_gt) * vw).sum() / n_valid
    off_loss = (jnp.abs(off_pred - off_gt) * vw).sum() / n_valid

    loss = heat_loss + 0.1 * wh_loss + off_loss
    metrics = {
        "det_heat_loss": heat_loss,
        "det_wh_loss": wh_loss,
        "det_off_loss": off_loss,
    }
    return loss, metrics


def segmentation_loss(
    outputs: dict[str, Array],
    gt_seg: Array,  # [B, H, W] i32 class ids, -1 = background
    stride: int,
) -> Array:
    """Per-class BCE on the seg head (MaskRCNN mask-head analog; target
    masks come from the scene's segmentation like the reference's
    synthetic training data)."""
    seg = outputs["seg"]  # [B, h, w, C]
    B, h, w, C = seg.shape
    # Nearest-neighbor downsample of the label map to head stride; crop
    # BOTH to the common extent (the backbone pads inputs to multiples of
    # its total stride, so the head can be larger than label_map/stride).
    tgt = gt_seg[:, ::stride, ::stride]
    mh = min(h, tgt.shape[1])
    mw = min(w, tgt.shape[2])
    seg = seg[:, :mh, :mw]
    tgt = tgt[:, :mh, :mw]
    onehot = jax.nn.one_hot(tgt, C)  # bg (-1) -> all-zeros row
    p = jax.nn.sigmoid(seg)
    bce = -(onehot * jnp.log(jnp.maximum(p, 1e-6))
            + (1 - onehot) * jnp.log(jnp.maximum(1 - p, 1e-6)))
    return bce.mean()


class Detector:
    """Inference wrapper with the reference's filtering semantics
    (inference/detector.py:64-139)."""

    def __init__(
        self,
        model: CenterNetDetector,
        params: Any,
        labels: list[str],
        detection_th: float = 0.7,
        one_instance_per_class: bool = False,
    ):
        self.model = model
        self.params = params
        self.labels = list(labels)
        self.detection_th = detection_th
        self.one_instance_per_class = one_instance_per_class
        def infer(p, im):
            raw = model.apply(p, im)
            out = decode_detections(
                raw, model.cfg.stride, model.cfg.max_detections
            )
            if model.cfg.predict_masks:
                seg = jax.nn.sigmoid(raw["seg"])  # [B, h, w, C]
                H, W = im.shape[1:3]
                out["seg"] = jax.image.resize(
                    seg, (seg.shape[0], H, W, seg.shape[3]), "bilinear"
                )
            return out

        self._infer = jax.jit(infer)

    def get_detections(
        self,
        observation,
        detection_th: float | None = None,
        one_instance_per_class: bool | None = None,
    ) -> PandasTensorCollection:
        th = detection_th if detection_th is not None else self.detection_th
        oipc = (
            one_instance_per_class
            if one_instance_per_class is not None
            else self.one_instance_per_class
        )
        out = self._infer(
            self.params, jnp.asarray(observation.images[..., :3])
        )
        boxes = np.asarray(out["boxes"][0])
        scores = np.asarray(out["scores"][0])
        classes = np.asarray(out["classes"][0])
        seg = np.asarray(out["seg"][0]) if "seg" in out else None

        keep = scores >= th
        boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
        if oipc and len(scores):
            # Keep highest-scoring instance per class
            # (detector.py:filter_detections one_instance_per_class).
            order = np.argsort(-scores)
            seen: set[int] = set()
            sel = []
            for i in order:
                if int(classes[i]) not in seen:
                    seen.add(int(classes[i]))
                    sel.append(i)
            sel = np.asarray(sel, int)
            boxes, scores, classes = boxes[sel], scores[sel], classes[sel]

        infos = pd.DataFrame(
            {
                "label": [self.labels[int(c)] for c in classes],
                "score": scores,
                "batch_im_id": np.zeros(len(scores), np.int64),
                "instance_id": np.arange(len(scores), dtype=np.int64),
            }
        )
        tensors = {"bboxes": boxes.astype(np.float32).reshape(-1, 4)}
        if seg is not None:
            # Per-instance mask = class channel restricted to the box
            # (MaskRCNN instance-mask contract, consumed by the RGBD
            # depth-refiner path via compute_masks).
            H, W = seg.shape[:2]
            yy = np.arange(H)[:, None]
            xx = np.arange(W)[None, :]
            masks = np.zeros((len(scores), H, W), bool)
            for i in range(len(scores)):
                x0, y0, x1, y1 = boxes[i]
                inside = (xx >= x0) & (xx <= x1) & (yy >= y0) & (yy <= y1)
                masks[i] = (seg[..., int(classes[i])] > 0.5) & inside
            tensors["masks"] = masks
        return PandasTensorCollection(infos, **tensors)
