"""Evaluation meters: pose-error metrics accumulated per view.

Re-design of the reference's meter framework (megapose6d:
src/megapose/evaluation/evaluation_runner.py:36-95,
evaluation/meters/modelnet_meters.py:35-103, meters/utils.py). Error
kernels are batched jnp; accumulation is host-side.

`ModelNetErrorMeter` reports the standard novel-object metrics:
  - ADD < 0.1 * diameter
  - 5 deg / 5 cm
  - proj2d < 5 px
"""

from __future__ import annotations

from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from ..data.tensor_collection import PandasTensorCollection
from ..ops import se3
from ..ops.camera import project_points


def one_to_one_matching(
    pred_infos,
    gt_infos,
    keys=("scene_id", "view_id", "label"),
    allow_pred_missing: bool = False,
):
    """Match prediction rows to GT rows on key columns
    (meters/utils.py:one_to_one_matching:11)."""
    pred_infos = pred_infos.reset_index(drop=True).copy()
    gt_infos = gt_infos.reset_index(drop=True).copy()
    pred_infos["pred_id"] = np.arange(len(pred_infos))
    gt_infos["gt_id"] = np.arange(len(gt_infos))
    merged = gt_infos.merge(pred_infos, on=list(keys), how="left")
    if not allow_pred_missing:
        assert merged["pred_id"].notna().all(), "missing predictions"
        merged = merged[merged["pred_id"].notna()]
    return merged


def compute_errors(
    TCO_pred: np.ndarray,  # [N, 4, 4]
    TCO_gt: np.ndarray,  # [N, 4, 4]
    points: np.ndarray,  # [N, P, 3]
    K: np.ndarray,  # [N, 3, 3]
    symmetric: np.ndarray | None = None,  # [N] bool -> use ADD-S
) -> dict[str, np.ndarray]:
    """Batched pose errors (modelnet_meters.py:55-88 semantics)."""
    TCO_pred = jnp.asarray(TCO_pred, jnp.float32)
    TCO_gt = jnp.asarray(TCO_gt, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    K = jnp.asarray(K, jnp.float32)

    pred_pts = se3.transform_pts(TCO_pred, points)
    gt_pts = se3.transform_pts(TCO_gt, points)
    add = jnp.linalg.norm(pred_pts - gt_pts, axis=-1).mean(-1)  # [N]

    d2 = jnp.sum(
        (pred_pts[:, :, None, :] - gt_pts[:, None, :, :]) ** 2, -1
    )
    adds = jnp.sqrt(jnp.min(d2, axis=-1)).mean(-1)

    rot_err_deg = jnp.degrees(
        se3.geodesic_distance(TCO_pred[:, :3, :3], TCO_gt[:, :3, :3])
    )
    trans_err = jnp.linalg.norm(
        TCO_pred[:, :3, 3] - TCO_gt[:, :3, 3], axis=-1
    )

    uv_pred = project_points(points, K, TCO_pred)
    uv_gt = project_points(points, K, TCO_gt)
    proj2d = jnp.linalg.norm(uv_pred - uv_gt, axis=-1).mean(-1)

    add_or_adds = add
    if symmetric is not None:
        add_or_adds = jnp.where(jnp.asarray(symmetric), adds, add)

    return {
        "add": np.asarray(add),
        "adds": np.asarray(adds),
        "add_or_adds": np.asarray(add_or_adds),
        "rot_err_deg": np.asarray(rot_err_deg),
        "trans_err": np.asarray(trans_err),
        "proj2d": np.asarray(proj2d),
    }


class Meter:
    """Base accumulate/summarize meter (meters/base.py)."""

    def __init__(self):
        self.datas: dict[str, list] = defaultdict(list)

    def reset(self) -> None:
        self.datas = defaultdict(list)

    def add(self, pred_data, gt_data) -> None:
        raise NotImplementedError

    def gather_distributed(self, arrays_by_rank: list[dict]) -> None:
        """Merge per-rank meter states (file/allgather transport is up to
        the caller; replaces meters/base.py:43-67 file-based gather)."""
        for datas in arrays_by_rank:
            for k, v in datas.items():
                self.datas[k].extend(v)


class ModelNetErrorMeter(Meter):
    """(modelnet_meters.py:35-103)"""

    def __init__(self, mesh_db, sample_n_points: int = 500):
        super().__init__()
        self.mesh_db = mesh_db
        self.n_points = sample_n_points

    def add(
        self,
        pred_data: PandasTensorCollection,
        gt_data: PandasTensorCollection,
    ) -> None:
        keys = tuple(
            k
            for k in ("scene_id", "view_id", "label")
            if k in pred_data.infos.columns and k in gt_data.infos.columns
        )
        matches = one_to_one_matching(
            pred_data.infos, gt_data.infos, keys=keys,
        )
        pred_ids = matches["pred_id"].to_numpy().astype(int)
        gt_ids = matches["gt_id"].to_numpy().astype(int)
        labels = matches["label"].tolist()
        idx = self.mesh_db.label_to_index(labels)
        meshes = self.mesh_db.select(idx)
        pts = np.asarray(meshes.points)[:, : self.n_points]
        diam = np.asarray(meshes.diameters)

        errs = compute_errors(
            np.asarray(pred_data.poses)[pred_ids],
            np.asarray(gt_data.poses)[gt_ids],
            pts,
            np.asarray(gt_data.K)[gt_ids],
        )
        self.datas["add"].extend(errs["add"].tolist())
        self.datas["diameter"].extend(diam.tolist())
        self.datas["rot_err_deg"].extend(errs["rot_err_deg"].tolist())
        self.datas["trans_err"].extend(errs["trans_err"].tolist())
        self.datas["proj2d"].extend(errs["proj2d"].tolist())

    def summary(self) -> dict[str, float]:
        add = np.asarray(self.datas["add"])
        diam = np.asarray(self.datas["diameter"])
        rot = np.asarray(self.datas["rot_err_deg"])
        trans = np.asarray(self.datas["trans_err"])
        proj = np.asarray(self.datas["proj2d"])
        n = max(len(add), 1)
        return {
            "n": int(len(add)),
            "ADD_0.1d": float((add < 0.1 * diam).sum() / n),
            "5deg_5cm": float(((rot < 5.0) & (trans < 0.05)).sum() / n),
            "proj2d_5px": float((proj < 5.0).sum() / n),
            "add_mean": float(add.mean()) if len(add) else float("nan"),
        }
