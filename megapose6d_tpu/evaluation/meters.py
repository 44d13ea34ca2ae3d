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

import jax
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
    keys = list(keys)
    # The merge below is only one-to-one if the keys are unique on both
    # sides; duplicates (multi-instance scenes without instance_id in the
    # keys) would silently cross-product and corrupt the metrics.
    for name, df in (("pred", pred_infos), ("gt", gt_infos)):
        if df.duplicated(subset=keys).any():
            raise ValueError(
                f"one_to_one_matching: duplicate {keys} keys in {name} infos "
                "(multi-instance scene?); include 'instance_id' in keys"
            )
    merged = gt_infos.merge(pred_infos, on=keys, how="left")
    if not allow_pred_missing:
        assert merged["pred_id"].notna().all(), "missing predictions"
    else:
        merged = merged[merged["pred_id"].notna()]
    merged = merged.copy()
    merged["pred_id"] = merged["pred_id"].astype(int)
    return merged


def match_predictions(pred_infos, gt_infos):
    """Match prediction rows to GT rows for metric computation.

    Exact (label, instance_id) key matching when it holds (GT-driven
    detections); otherwise BOP19-style greedy matching per
    (scene_id, view_id, label) group — predictions claim GT instances in
    score order (toolkit pose_matching semantics), and GT instances
    without a prediction are returned as misses so meters can score them
    as infinite error instead of crashing (detector-driven eval:
    detection-order instance_ids + possible missed objects).

    Returns (pred_ids [N], gt_ids [N], missed_gt_ids [M]) as int arrays.
    """
    keys = tuple(
        k
        for k in ("scene_id", "view_id", "label", "instance_id")
        if k in pred_infos.columns and k in gt_infos.columns
    )
    try:
        matches = one_to_one_matching(pred_infos, gt_infos, keys=keys)
        return (
            matches["pred_id"].to_numpy().astype(int),
            matches["gt_id"].to_numpy().astype(int),
            np.zeros((0,), int),
        )
    except (ValueError, AssertionError):
        pass
    pred = pred_infos.reset_index(drop=True).copy()
    gt = gt_infos.reset_index(drop=True).copy()
    pred["pred_id"] = np.arange(len(pred))
    gt["gt_id"] = np.arange(len(gt))
    group_keys = [
        k
        for k in ("scene_id", "view_id", "label")
        if k in pred.columns and k in gt.columns
    ]
    score_col = next(
        (c for c in ("score", "pose_score", "pose_logit") if c in pred.columns),
        None,
    )
    pred_ids, gt_ids, missed = [], [], []
    pred_groups = dict(tuple(pred.groupby(group_keys, sort=False)))
    for gkey, gt_grp in gt.groupby(group_keys, sort=False):
        p_grp = pred_groups.get(gkey)
        if p_grp is not None and score_col is not None:
            p_grp = p_grp.sort_values(score_col, ascending=False)
        n_pred = 0 if p_grp is None else len(p_grp)
        for i, gt_id in enumerate(gt_grp["gt_id"].to_numpy()):
            if i < n_pred:
                pred_ids.append(int(p_grp["pred_id"].iloc[i]))
                gt_ids.append(int(gt_id))
            else:
                missed.append(int(gt_id))
    return (
        np.asarray(pred_ids, int),
        np.asarray(gt_ids, int),
        np.asarray(missed, int),
    )


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


def compute_mssd_mspd(
    TCO_pred: np.ndarray,  # [N, 4, 4]
    TCO_gt: np.ndarray,  # [N, 4, 4]
    points: np.ndarray,  # [N, P, 3]
    K: np.ndarray,  # [N, 3, 3]
    symmetries: np.ndarray,  # [N, S, 4, 4] (identity-padded)
    sym_valid: np.ndarray | None = None,  # [N, S]
) -> dict[str, np.ndarray]:
    """Maximum Symmetry-aware Surface/Projection Distance (the BOP19
    errors the reference scores via the bop_toolkit subprocess,
    evaluation/bop.py:140-176; in-tree here, batched jnp):

      MSSD = min_S max_p  | T_pred p - T_gt S p |
      MSPD = min_S max_p  | proj(T_pred p) - proj(T_gt S p) |
    """
    TCO_pred = jnp.asarray(TCO_pred, jnp.float32)
    TCO_gt = jnp.asarray(TCO_gt, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    syms = jnp.asarray(symmetries, jnp.float32)

    TCO_gt_sym = jnp.einsum(
        "nij,nsjk->nsik", TCO_gt, syms,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, S, 4, 4]
    pred_pts = se3.transform_pts(TCO_pred, points)  # [N, P, 3]
    gt_pts = se3.transform_pts(TCO_gt_sym, points)  # [N, S, P, 3]

    d3 = jnp.linalg.norm(pred_pts[:, None] - gt_pts, axis=-1)  # [N, S, P]
    max_over_p = jnp.max(d3, axis=-1)  # [N, S]

    uv_pred = project_points(points, K, TCO_pred)  # [N, P, 2]
    uv_gt = jax.vmap(
        lambda pts, Kn, Ts: jax.vmap(
            lambda T: project_points(pts[None], Kn[None], T[None])[0]
        )(Ts)
    )(points, K, TCO_gt_sym)  # [N, S, P, 2]
    d2 = jnp.linalg.norm(uv_pred[:, None] - uv_gt, axis=-1)
    max_over_p_2d = jnp.max(d2, axis=-1)  # [N, S]

    if sym_valid is not None:
        big = jnp.asarray(1e30, jnp.float32)
        sv = jnp.asarray(sym_valid)
        max_over_p = jnp.where(sv, max_over_p, big)
        max_over_p_2d = jnp.where(sv, max_over_p_2d, big)
    return {
        "mssd": np.asarray(jnp.min(max_over_p, axis=-1)),
        "mspd": np.asarray(jnp.min(max_over_p_2d, axis=-1)),
    }


class BOPScoreMeter:
    """BOP19-style average recall from in-tree MSSD/MSPD.

    AR_MSSD averages recall over thresholds {0.05..0.5} x object
    diameter; AR_MSPD over {5..50} px x (image_width/640) — the
    bop_toolkit conventions (its eval_bop19 defaults). VSD (the third
    BOP19 error) needs depth-image rendering of GT and estimate and
    stays with the subprocess bridge.
    """

    def __init__(self, mesh_db, image_width: int = 640, n_points: int = 500):
        self.mesh_db = mesh_db
        self.image_width = image_width
        self.n_points = n_points
        self.datas: dict[str, list] = defaultdict(list)

    def add(self, pred_data, gt_data, frame=None) -> None:
        pred_ids, gt_ids, missed = match_predictions(
            pred_data.infos, gt_data.infos
        )
        if len(pred_ids):
            labels = gt_data.infos["label"].iloc[gt_ids].tolist()
            idx = self.mesh_db.label_to_index(labels)
            meshes = self.mesh_db.select(idx)
            pts = np.asarray(meshes.points)[:, : self.n_points]
            TCO_pred = np.asarray(pred_data.poses)[pred_ids]
            TCO_gt = np.asarray(gt_data.poses)[gt_ids]
            K = np.asarray(gt_data.K)[gt_ids]
            errs = compute_mssd_mspd(
                TCO_pred,
                TCO_gt,
                pts,
                K,
                np.asarray(meshes.symmetries),
                np.asarray(meshes.sym_valid),
            )
            # A non-finite error (NaN pose that escaped a refiner's
            # fallback) is a miss, same as an unmatched GT: inf keeps the
            # recall thresholds false AND the medians meaningful (NaN
            # medians shipped in the r05 depth-refined AR row).
            self.datas["mssd"].extend(
                np.where(np.isfinite(errs["mssd"]), errs["mssd"],
                         np.inf).tolist()
            )
            self.datas["mspd"].extend(
                np.where(np.isfinite(errs["mspd"]), errs["mspd"],
                         np.inf).tolist()
            )
            diam = np.asarray(meshes.diameters)
            self.datas["diameter"].extend(diam.tolist())
            if frame is not None and frame.depth is not None:
                # In-tree VSD via the on-device renderer
                # (evaluation/vsd.py) — completes the BOP19 AR triple
                # without the toolkit subprocess.
                from .vsd import compute_vsd

                e_vsd = compute_vsd(
                    frame.depth, TCO_pred, TCO_gt, K[0], meshes, diam
                )  # [N, n_taus]
                self.datas["vsd"].extend(e_vsd.tolist())
        # GT instances with no prediction (detector misses) score as
        # infinite error — they stay in the recall denominator, exactly
        # like unestimated targets in bop_toolkit's pose_matching.
        if len(missed):
            m_labels = gt_data.infos["label"].iloc[missed].tolist()
            m_diam = np.asarray(
                self.mesh_db.select(
                    self.mesh_db.label_to_index(m_labels)
                ).diameters
            )
            self.datas["mssd"].extend([np.inf] * len(missed))
            self.datas["mspd"].extend([np.inf] * len(missed))
            self.datas["diameter"].extend(m_diam.tolist())
            if frame is not None and frame.depth is not None:
                from .vsd import BOP19_VSD_TAUS

                self.datas["vsd"].extend(
                    [[np.inf] * len(BOP19_VSD_TAUS)] * len(missed)
                )

    def summary(self) -> dict[str, float]:
        mssd = np.asarray(self.datas["mssd"])
        mspd = np.asarray(self.datas["mspd"])
        diam = np.asarray(self.datas["diameter"])
        n = max(len(mssd), 1)
        rec_mssd = [
            float((mssd < t * diam).sum() / n)
            for t in np.arange(0.05, 0.51, 0.05)
        ]
        scale = self.image_width / 640.0
        rec_mspd = [
            float((mspd < t * scale).sum() / n)
            for t in np.arange(5.0, 50.1, 5.0)
        ]
        out = {
            "n": int(len(mssd)),
            "AR_MSSD": float(np.mean(rec_mssd)) if len(mssd) else 0.0,
            "AR_MSPD": float(np.mean(rec_mspd)) if len(mssd) else 0.0,
            "mssd_median": float(np.median(mssd)) if len(mssd) else float("nan"),
            "mspd_median": float(np.median(mspd)) if len(mssd) else float("nan"),
        }
        if self.datas["vsd"]:
            from .vsd import vsd_recall

            out["AR_VSD"] = vsd_recall(np.asarray(self.datas["vsd"]))
            out["AR"] = float(
                np.mean([out["AR_VSD"], out["AR_MSSD"], out["AR_MSPD"]])
            )
        else:
            out["AR"] = float(np.mean([out["AR_MSSD"], out["AR_MSPD"]]))
        return out


class Meter:
    """Base accumulate/summarize meter (meters/base.py)."""

    def __init__(self):
        self.datas: dict[str, list] = defaultdict(list)

    def reset(self) -> None:
        self.datas = defaultdict(list)

    def add(self, pred_data, gt_data, frame=None) -> None:
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
        frame=None,
    ) -> None:
        pred_ids, gt_ids, missed = match_predictions(
            pred_data.infos, gt_data.infos
        )
        if len(pred_ids):
            labels = gt_data.infos["label"].iloc[gt_ids].tolist()
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
        for gt_id in missed:  # detector misses: infinite error
            m_label = gt_data.infos["label"].iloc[int(gt_id)]
            m_diam = float(
                np.asarray(
                    self.mesh_db.select(
                        self.mesh_db.label_to_index([m_label])
                    ).diameters
                )[0]
            )
            self.datas["add"].append(np.inf)
            self.datas["diameter"].append(m_diam)
            self.datas["rot_err_deg"].append(np.inf)
            self.datas["trans_err"].append(np.inf)
            self.datas["proj2d"].append(np.inf)

    def summary(self) -> dict[str, float]:
        add = np.asarray(self.datas["add"])
        diam = np.asarray(self.datas["diameter"])
        rot = np.asarray(self.datas["rot_err_deg"])
        trans = np.asarray(self.datas["trans_err"])
        proj = np.asarray(self.datas["proj2d"])
        n = max(len(add), 1)
        finite = np.isfinite(add)
        return {
            "n": int(len(add)),
            "n_missed": int((~finite).sum()),
            "ADD_0.1d": float((add < 0.1 * diam).sum() / n),
            "5deg_5cm": float(((rot < 5.0) & (trans < 0.05)).sum() / n),
            "proj2d_5px": float((proj < 5.0).sum() / n),
            "add_mean": float(add[finite].mean())
            if finite.any()
            else float("nan"),
        }
