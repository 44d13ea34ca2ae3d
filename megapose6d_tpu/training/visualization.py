"""Training debug visualization: hypothesis crops vs renders grids.

Analog of the reference's in-training bokeh grids
(megapose6d: src/megapose/training/megapose_forward_loss.py:226-324),
rendered to PNG with the image-grid helper.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..models.pose_predictor import PosePredictor
from .forward_loss import BatchPoseData


def make_debug_visualization(
    params,
    model: PosePredictor,
    batch: BatchPoseData,
    mesh_db,
    out_path: str | Path,
    max_samples: int = 4,
) -> np.ndarray:
    """Run one refine/score step and save [obs crop | render] rows."""
    from ..visualization.plotter import save_image_grid

    n = min(max_samples, batch.batch_size)
    images = batch.images()[:n]
    meshes = mesh_db.select(batch.mesh_idx[:n])
    method = (
        PosePredictor.score_views
        if model.cfg.predict_rendered_views_logits
        else PosePredictor.refine_step
    )
    out = model.apply(
        params, images, batch.K[:n], batch.TCO[:n], meshes, method=method
    )
    tiles = []
    for i in range(n):
        tiles.append(np.asarray(out["images_crop"][i][..., :3]))
        tiles.append(np.asarray(out["renders"][i][..., :3]))
    grid = save_image_grid(tiles, out_path, n_cols=2)
    return grid
