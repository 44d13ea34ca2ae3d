"""Visualization: detections, pose-overlay contours, image grids.

Re-design of the reference's bokeh plotter
(megapose6d: src/megapose/visualization/bokeh_plotter.py:38+ and
bokeh_utils) on matplotlib/PIL (bokeh is not a dependency). Pose overlays
render the estimated pose with the on-device rasterizer and blend contours
over the observation — the same diagnostic the reference's example script
produces.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return img


def plot_detections(
    rgb: np.ndarray, detections, out_path: str | Path | None = None
):
    """Draw detection boxes + labels. `detections`: DetectionsType."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(_to_uint8(rgb))
    boxes = np.asarray(detections.bboxes)
    for i, row in enumerate(detections.infos.itertuples()):
        x1, y1, x2, y2 = boxes[i]
        ax.add_patch(
            plt.Rectangle(
                (x1, y1), x2 - x1, y2 - y1, fill=False, color="lime", lw=2
            )
        )
        ax.text(x1, y1 - 3, str(row.label), color="lime", fontsize=9)
    ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig


def plot_pose_overlay(
    rgb: np.ndarray,
    mesh_db,
    labels: list[str],
    poses: np.ndarray,
    K: np.ndarray,
    out_path: str | Path | None = None,
    alpha: float = 0.6,
    contour_out_path: str | Path | None = None,
):
    """Blend renders of the estimated poses over the observation.
    `contour_out_path` additionally writes the reference's signature
    contour-overlay image (silhouette outline over the RGB)."""
    import jax.numpy as jnp

    from ..ops import rasterizer

    H, W = rgb.shape[:2]
    idx = mesh_db.label_to_index(labels)
    meshes = mesh_db.select(idx)
    B = len(labels)
    out = rasterizer.render_meshes(
        meshes.vertices, meshes.normals, meshes.colors, meshes.faces,
        meshes.face_valid,
        jnp.asarray(poses, jnp.float32),
        jnp.broadcast_to(jnp.asarray(K, jnp.float32), (B, 3, 3)),
        (H, W),
    )
    overlay = _to_uint8(rgb).astype(np.float32) / 255.0
    for b in range(B):
        mask = np.asarray(out.mask[b])[..., None]
        rend = np.asarray(out.rgb[b])
        overlay = np.where(
            mask, (1 - alpha) * overlay + alpha * rend, overlay
        )
    overlay = _to_uint8(overlay)
    if out_path:
        from PIL import Image

        Image.fromarray(overlay).save(out_path)
    if contour_out_path is not None:
        union = np.zeros(rgb.shape[:2], bool)
        for b in range(B):
            union |= np.asarray(out.mask[b])
        make_contour_overlay(rgb, union, out_path=contour_out_path)
    return overlay


def save_image_grid(
    images: list[np.ndarray], out_path: str | Path, n_cols: int = 4
):
    """Tile images into a grid PNG (training-visualization analog of
    megapose_forward_loss.py:226-324)."""
    from PIL import Image

    images = [_to_uint8(im) for im in images]
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    n_rows = (len(images) + n_cols - 1) // n_cols
    grid = np.zeros((n_rows * h, n_cols * w, 3), np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, n_cols)
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, -1)
        grid[r * h : r * h + im.shape[0], c * w : c * w + im.shape[1]] = im[
            ..., :3
        ]
    Image.fromarray(grid).save(out_path)
    return grid


def make_contour_overlay(
    rgb: np.ndarray,
    mask: np.ndarray,
    color=(0, 255, 0),
    thickness: int = 2,
    out_path: str | Path | None = None,
) -> np.ndarray:
    """Draw the silhouette contour of a rendered-pose mask over the
    observation — the reference's signature output image
    (visualization/utils.py:make_contour_overlay:56-85). Edge extraction
    is a morphological gradient (binary dilation minus erosion) instead
    of cv2.Canny; `thickness` plays the role of dilate_iterations."""
    img = _to_uint8(rgb).copy()
    m = np.asarray(mask).astype(bool)
    if m.ndim == 3:
        m = m[..., 0]

    def shift_or(a, k):
        out = np.zeros_like(a)
        for dv in range(-k, k + 1):
            for du in range(-k, k + 1):
                s = np.roll(np.roll(a, dv, axis=0), du, axis=1)
                out |= s
        return out

    dil = shift_or(m, thickness)
    ero = ~shift_or(~m, thickness)
    edge = dil & ~ero
    img[edge] = np.asarray(color, np.uint8)
    if out_path:
        from PIL import Image

        Image.fromarray(img).save(out_path)
    return img
