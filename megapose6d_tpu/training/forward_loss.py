"""Hypothesis generation + training losses (coarse & refiner).

TPU-native re-design of the reference's `megapose_forward_loss`
(megapose6d: src/megapose/training/megapose_forward_loss.py:47-330).
Pure function of (params, batch, rng) — JAX PRNG replaces numpy RNG, the
iteration loop is a `lax.scan`, and hypothesis sampling for the coarse
multiview-classification objective is branch-free.
"""

from __future__ import annotations

import math
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ..meshes.mesh_db import BatchedMeshes
from ..models.pose_predictor import PosePredictor
from ..ops import losses as loss_ops
from ..ops import multiview
from ..ops.pose_init import (
    tco_init_from_boxes_autodepth_with_R,
    tco_init_from_boxes_zup_autodepth,
)
from ..ops.se3 import (
    add_pose_noise,
    geodesic_distance,
    random_rotations,
    small_random_rotations,
)
from .config import TrainingConfig

Array = jax.Array


@flax.struct.dataclass
class BatchPoseData:
    """Training batch (analog of datasets/pose_dataset.py:77-105).

    rgbs in [0,1] float NHWC; depths meters or zeros; K [B,3,3];
    TCO [B,4,4] GT camera<-object; bboxes [B,4] xyxy; mesh_idx [B] i32.
    """

    rgbs: Array
    K: Array
    TCO: Array
    bboxes: Array
    mesh_idx: Array
    depths: Array | None = None

    @property
    def batch_size(self) -> int:
        return self.rgbs.shape[0]

    def images(self) -> Array:
        if self.depths is None:
            return self.rgbs
        return jnp.concatenate([self.rgbs, self.depths[..., None]], -1)


def make_hypotheses(
    key: Array,
    cfg: TrainingConfig,
    batch: BatchPoseData,
    meshes: BatchedMeshes,
) -> tuple[Array, Array | None]:
    """Build `[B, n_hyp, 4, 4]` initial poses + optional positive labels
    (megapose_forward_loss.py:75-141)."""
    B = batch.batch_size
    H = cfg.n_hypotheses
    method = cfg.hypotheses_init_method

    if method == "coarse_z_up+auto-depth":
        assert H == 1
        TCO_init = tco_init_from_boxes_zup_autodepth(
            batch.bboxes, meshes.points, batch.K
        )
        TCO_init = add_pose_noise(
            key, TCO_init, euler_deg_std=(0, 0, 0), trans_std=(0.01, 0.01, 0.05)
        )
        return TCO_init[:, None], None

    if method == "refiner_gt+noise":
        flat = jnp.repeat(batch.TCO, H, axis=0)
        noisy = add_pose_noise(
            key, flat,
            euler_deg_std=cfg.init_euler_deg_std,
            trans_std=cfg.init_trans_std,
        )
        return noisy.reshape(B, H, 4, 4), None

    if method == "coarse_classif_multiview_paper":
        k_noise, k_perm, k_force, k_pos = jax.random.split(key, 4)
        TCO_gt_noise = add_pose_noise(
            k_noise, batch.TCO,
            euler_deg_std=cfg.init_euler_deg_std,
            trans_std=cfg.init_trans_std,
        )
        tCR = TCO_gt_noise[..., :3, 3]
        TCV_O = multiview.make_TCO_multiview(
            TCO_gt_noise,
            tCR,
            multiview_type="sphere_26views",
            n_views=27,
            remove_TCO_rendering=True,
            views_inplane_rotations=True,
        )  # [B, 104, 4, 4]
        n_cand = TCV_O.shape[1]

        # Per-sample random selection of H candidate views; a hypothesis is
        # positive iff it is view 0 (the noised-GT view). 70% of the time a
        # batch element with no positive gets one forced in — the reference's
        # `if np.random.rand() > 0.3` (megapose_forward_loss.py:120-133; its
        # inline comment says 30% but the code, which is the contract, forces
        # at 70%).
        perm = jax.vmap(
            lambda k: jax.random.permutation(k, n_cand)[:H]
        )(jax.random.split(k_perm, B))  # [B, H]
        has_pos = (perm == 0).any(axis=1)  # [B]
        force = (jax.random.uniform(k_force, (B,)) > 0.3) & ~has_pos
        pos_slot = jax.random.randint(k_pos, (B,), 0, H)
        slot_onehot = jax.nn.one_hot(pos_slot, H, dtype=bool)
        perm = jnp.where(force[:, None] & slot_onehot, 0, perm)
        is_positive = (perm == 0).astype(jnp.float32)  # [B, H]
        TCO_init = jnp.take_along_axis(
            TCV_O, perm[..., None, None], axis=1
        )
        return TCO_init, is_positive

    if method == "coarse_classif_grid":
        # TPU-first coarse objective, aligned with the *inference* task:
        # at test time every candidate is a grid rotation box-fitted with
        # autodepth from the same detection (pose_estimator.py:124-135,
        # reference inference/pose_estimator.py:384-419), so translation
        # carries zero label signal and the scorer must match rendered
        # orientation against the image. The reference's multiview recipe
        # (megapose_forward_loss.py:107-141) instead draws negatives from
        # camera sphere moves whose translation/scale statistics differ
        # from box-fitted candidates; empirically (round-3 run, 12k steps)
        # a scorer trained on it stays at chance on grid ranking — it
        # learns the frustum shortcut, not orientation. Negatives here are
        # Haar-uniform rotations; the positive (forced in with prob 0.7,
        # as in the reference's hypothesis balancing) is GT composed with
        # a small rotation. Labels are symmetry-aware: positive iff the
        # hypothesis is within `cfg.coarse_pos_angle_deg` of the GT
        # rotation orbit, which also relabels lucky near-GT negatives.
        k_rot, k_small, k_force, k_pos, k_hard, k_hsel = jax.random.split(
            key, 6
        )
        thresh = jnp.deg2rad(cfg.coarse_pos_angle_deg)
        R_rand = random_rotations(k_rot, (B, H))  # [B, H, 3, 3]
        # Hard candidates: GT composed with a moderate rotation, densely
        # covering the positive/negative angular boundary (some land
        # within `thresh` and are relabeled positive below — that's the
        # point: fine ranking needs examples on both sides of it).
        R_hard = jnp.einsum(
            "bij,bhjk->bhik",
            batch.TCO[:, :3, :3],
            small_random_rotations(
                k_hard, (B, H),
                math.radians(cfg.coarse_hard_neg_max_deg),
            ),
        )
        use_hard = (
            jax.random.uniform(k_hsel, (B, H)) < cfg.coarse_hard_neg_frac
        )
        R_rand = jnp.where(use_hard[..., None, None], R_hard, R_rand)
        R_pos = jnp.einsum(
            "bij,bjk->bik",
            batch.TCO[:, :3, :3],
            small_random_rotations(
                k_small, (B,),
                math.radians(cfg.coarse_pos_angle_deg) * 0.8,
            ),
        )
        force = jax.random.uniform(k_force, (B,)) > 0.3
        slot = jax.nn.one_hot(
            jax.random.randint(k_pos, (B,), 0, H), H, dtype=bool
        )
        put = force[:, None] & slot
        R_hyp = jnp.where(put[..., None, None], R_pos[:, None], R_rand)
        TCO_init = tco_init_from_boxes_autodepth_with_R(
            jnp.repeat(batch.bboxes, H, axis=0),
            jnp.repeat(meshes.points, H, axis=0),
            jnp.repeat(batch.K, H, axis=0),
            R_hyp.reshape(B * H, 3, 3),
        ).reshape(B, H, 4, 4)
        R_sym = jnp.einsum(
            "bij,bsjk->bsik",
            batch.TCO[:, :3, :3],
            meshes.symmetries[:, :, :3, :3],
        )  # [B, S, 3, 3]
        d = geodesic_distance(
            R_hyp[:, :, None], R_sym[:, None]
        )  # [B, H, S]
        d = jnp.where(meshes.sym_valid[:, None, :], d, jnp.inf).min(-1)
        is_positive = (d <= thresh).astype(jnp.float32)
        return TCO_init, is_positive

    raise ValueError(method)


def forward_loss(
    params: Any,
    model: PosePredictor,
    cfg: TrainingConfig,
    batch: BatchPoseData,
    mesh_db: BatchedMeshes,
    key: Array,
    n_iterations: int,
) -> tuple[Array, dict[str, Array]]:
    """Scalar training loss + metric dict (megapose_forward_loss.py:47-224)."""
    B = batch.batch_size
    H = cfg.n_hypotheses
    meshes = mesh_db.select(batch.mesh_idx)  # [B, ...]

    k_hyp, k_pts, k_amb = jax.random.split(key, 3)
    TCO_init, is_positive = make_hypotheses(k_hyp, cfg, batch, meshes)

    # Flatten hypotheses into the batch axis.
    images = batch.images()
    images_f = jnp.repeat(images, H, axis=0)
    K_f = jnp.repeat(batch.K, H, axis=0)
    mesh_idx_f = jnp.repeat(batch.mesh_idx, H, axis=0)
    meshes_f = mesh_db.select(mesh_idx_f)
    TCO_f = TCO_init.reshape(B * H, 4, 4)

    ambient = None
    if cfg.random_ambient_light:
        ambient = jax.random.uniform(
            k_amb, (B * H,), minval=0.7, maxval=1.0
        )

    # Symmetry-aware GT set + loss points (megapose_forward_loss.py:152-156).
    TCO_possible_gt = jnp.einsum(
        "bij,bsjk->bsik", batch.TCO, meshes.symmetries,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, S, 4, 4]
    sym_valid = meshes.sym_valid
    n_pts = min(cfg.n_points_loss, meshes.points.shape[1])
    scores = jax.random.uniform(k_pts, meshes.points.shape[:2])
    _, pt_ids = jax.lax.top_k(scores, n_pts)
    points = jnp.take_along_axis(meshes.points, pt_ids[..., None], axis=1)

    TCO_possible_gt_f = jnp.repeat(TCO_possible_gt, H, axis=0)
    sym_valid_f = jnp.repeat(sym_valid, H, axis=0)
    points_f = jnp.repeat(points, H, axis=0)

    metrics: dict[str, Array] = {}
    loss_total = jnp.zeros((), jnp.float32)

    if cfg.predict_pose_update:
        def body(T, _):
            out = model.apply(
                params, images_f, K_f, T, meshes_f,
                method=PosePredictor.refine_step, ambient=ambient,
            )
            loss_iter, loss_data = (
                loss_ops.loss_refiner_CO_disentangled_reference_point(
                    TCO_possible_gt=TCO_possible_gt_f,
                    TCO_input=out["TCO_input"],
                    refiner_outputs=out["network_outputs"]["pose"],
                    K_crop=out["K_crop"],
                    points=points_f,
                    tCR=out["tCR"],
                    sym_valid=sym_valid_f,
                )
            )
            aux = {
                "loss": loss_iter.mean(),
                "loss_orn": loss_data["loss_orn"].mean(),
                "loss_xy": loss_data["loss_xy"].mean(),
                "loss_z": loss_data["loss_z"].mean(),
            }
            return out["TCO_output"], aux

        _, iter_metrics = jax.lax.scan(body, TCO_f, None, length=n_iterations)
        loss_pose = iter_metrics["loss"].mean()
        loss_total = loss_total + cfg.loss_alpha_pose * loss_pose
        metrics["loss_TCO"] = loss_pose
        for k in ("loss_orn", "loss_xy", "loss_z"):
            metrics[f"loss_TCO-{k}"] = iter_metrics[k].mean()

    if cfg.predict_rendered_views_logits:
        assert is_positive is not None
        out = model.apply(
            params, images_f, K_f, TCO_f, meshes_f,
            method=PosePredictor.score_views, ambient=ambient,
        )
        logits = out["logits"].reshape(B, H)
        logits = logits / cfg.renderings_logits_temperature
        bce = optax_sigmoid_bce(logits, is_positive).mean()
        loss_total = loss_total + cfg.loss_alpha_renderings_confidence * bce
        metrics["loss_renderings_confidence"] = bce
        acc = ((logits > 0) == (is_positive > 0.5)).mean()
        metrics["views_accuracy"] = acc

    metrics["loss_total"] = loss_total
    return loss_total, metrics


def optax_sigmoid_bce(logits: Array, labels: Array) -> Array:
    """BCEWithLogits (stable form)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
