"""PoseEstimator — the public inference pipeline.

TPU-native re-design of the reference's `PoseEstimator`
(megapose6d: src/megapose/inference/pose_estimator.py:52-667). Pipeline
parity (`run_inference_pipeline`, pose_estimator.py:510-641):

  detections -> coarse scoring of M SO(3)-grid hypotheses per detection
  -> top-K -> K x N-iteration refiner -> coarse re-scoring -> top-1
  [-> optional depth refinement]

Architectural differences, all deliberate TPU choices:
  - The reference expands hypotheses into pandas rows and micro-batches
    through throwaway DataLoaders (pose_estimator.py:140-149, 348-377);
    here hypotheses are a static `[D, M]` array axis, detections are padded
    to `max_detections`, and the whole coarse+refine+rescore pipeline is a
    handful of jitted XLA programs with `lax.map` chunking (bsz knobs kept).
  - top-K via `jax.lax.top_k` instead of pandas sort/groupby/head
    (filter_pose_estimates, pose_estimator.py:643-667).
  - The refiner loop is `lax.scan`; renders never leave the device.
  - pandas appears only at the API edge (DetectionsType in,
    PoseEstimatesType out), keeping reference-compatible columns.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.tensor_collection import PandasTensorCollection
from ..meshes.mesh_db import BatchedMeshes
from ..models.pose_predictor import PosePredictor
from ..ops import so3_grid
from ..ops.pose_init import tco_init_from_boxes_autodepth_with_R
from .types import InferenceConfig

Array = jax.Array


def _pad_to(x: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return np.take(x, range(n), axis=axis)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode="edge")


class PoseEstimator:
    """Coarse + refiner orchestration over one observation.

    Args:
      coarse_model / refiner_model: `PosePredictor` modules.
      coarse_params / refiner_params: their variables.
      mesh_db: padded `BatchedMeshes` covering all labels in play.
      cfg: `InferenceConfig`.
    """

    def __init__(
        self,
        coarse_model: PosePredictor,
        coarse_params: Any,
        refiner_model: PosePredictor,
        refiner_params: Any,
        mesh_db: BatchedMeshes,
        cfg: InferenceConfig = InferenceConfig(),
        depth_refiner=None,
        detector=None,
        device_mesh=None,
        mesh_db_coarse: BatchedMeshes | None = None,
    ):
        self.coarse_model = coarse_model
        self.coarse_params = coarse_params
        # Final-selection precision (InferenceConfig.rescore_f32): a twin
        # coarse module computing in f32 with the SAME params — dtype in
        # PosePredictor only drives activation casts, so params apply
        # unchanged.
        if cfg.rescore_f32 and coarse_model.cfg.compute_dtype != "float32":
            import dataclasses as _dc

            self.coarse_model_rescore = type(coarse_model)(
                _dc.replace(coarse_model.cfg, compute_dtype="float32")
            )
        else:
            self.coarse_model_rescore = coarse_model
        # Sweep-stage twin (InferenceConfig.coarse_render_size): the bulk
        # SO(3)-grid sweep rasterizes its renders at a reduced resolution
        # and upsamples before the CNN — same params (render resolution
        # does not touch the param tree), ~linear raster-cost savings on
        # the phase that dominates pipeline time. Rescoring keeps
        # full-resolution renders.
        if cfg.coarse_render_size and tuple(cfg.coarse_render_size) != tuple(
            coarse_model.cfg.render_size
        ):
            import dataclasses as _dc

            self.coarse_model_sweep = type(coarse_model)(
                _dc.replace(
                    coarse_model.cfg,
                    render_at=tuple(cfg.coarse_render_size),
                )
            )
        else:
            self.coarse_model_sweep = coarse_model
        self.refiner_model = refiner_model
        self.refiner_params = refiner_params
        self.mesh_db = mesh_db
        # Optional low-LOD mesh DB (decimated faces, same labels/points)
        # used by the coarse scorer + rescoring: at SO(3)-grid scale the
        # render cost is linear in face count while the coarse classifier
        # only needs silhouette-level fidelity. The refiner always renders
        # the full-LOD meshes. TPU-first optimization with no reference
        # analog (the Panda3D farm always renders full meshes).
        self.mesh_db_coarse = mesh_db_coarse if mesh_db_coarse is not None else mesh_db
        self.cfg = cfg
        self.depth_refiner = depth_refiner
        self.detector = detector
        # Optional jax.sharding.Mesh: hypothesis batches shard over its
        # 'dp' axis (the SURVEY §7 "shard the hypothesis axis over ICI"
        # scaling strategy — the reference's analog is per-GPU frame
        # splitting only).
        self.device_mesh = device_mesh
        self.so3_grid = so3_grid.make_so3_grid(cfg.SO3_grid_size)
        # Hierarchical coarse scoring: probe grid + Voronoi child table
        # (see InferenceConfig.SO3_prune_grid_size).
        if cfg.SO3_prune_grid_size:
            self.so3_prune_grid = so3_grid.make_so3_grid(
                cfg.SO3_prune_grid_size
            )
            ch, ok = so3_grid.build_prune_table(
                self.so3_grid, self.so3_prune_grid
            )
            self.prune_children = jnp.asarray(ch)
            self.prune_child_valid = jnp.asarray(ok)
        self.timing_: dict[str, float] = {}

    # ------------------------------------------------------------------
    # jitted cores
    # ------------------------------------------------------------------

    def _coarse_logits_all_impl(
        self,
        chunk: int,
        coarse_params,
        images: Array,  # [1, H, W, C]
        K: Array,  # [1, 3, 3]
        boxes: Array,  # [D, 4]
        mesh_idx: Array,  # [D] i32
        grid: Array,  # [M, 3, 3] shared, or [D, M, 3, 3] per-detection
    ) -> tuple[Array, Array]:
        """Score every (detection, grid-rotation) hypothesis.

        Returns (logits [D, M], TCO_init [D, M, 4, 4]).
        Analog of forward_coarse_model (pose_estimator.py:324-483).
        """
        D = boxes.shape[0]
        M = grid.shape[-3]
        meshes_d = self.mesh_db.select(mesh_idx)  # [D, ...]
        points = meshes_d.points  # [D, P, 3]

        # Pose init for all D x M (TCO_init_from_boxes_autodepth_with_R,
        # cosypose_ops.py:169-218).
        def init_d(box, pts, R_all):
            return jax.vmap(
                lambda R: tco_init_from_boxes_autodepth_with_R(
                    box[None], pts[None], K, R[None]
                )[0]
            )(R_all)

        if grid.ndim == 3:
            TCO_init = jax.vmap(lambda b, p: init_d(b, p, grid))(
                boxes, points
            )  # [D, M, 4, 4]
        else:  # per-detection candidate sets (hierarchical stage 2)
            TCO_init = jax.vmap(init_d)(boxes, points, grid)

        flat_TCO = TCO_init.reshape(D * M, 4, 4)
        flat_idx = jnp.repeat(mesh_idx, M, axis=0)
        n = D * M
        n_chunks = (n + chunk - 1) // chunk
        n_pad = n_chunks * chunk
        flat_TCO = jnp.concatenate(
            [flat_TCO, jnp.tile(jnp.eye(4, dtype=flat_TCO.dtype), (n_pad - n, 1, 1))]
        )
        flat_idx = jnp.concatenate(
            [flat_idx, jnp.zeros((n_pad - n,), flat_idx.dtype)]
        )

        def score_chunk(args):
            TCO_c, idx_c = args
            meshes_c = self.mesh_db_coarse.select(idx_c)
            imgs = jnp.broadcast_to(
                images, (chunk,) + images.shape[1:]
            )
            K_c = jnp.broadcast_to(K, (chunk, 3, 3))
            out = self.coarse_model_sweep.apply(
                coarse_params,
                imgs,
                K_c,
                TCO_c,
                meshes_c,
                method=PosePredictor.score_views,
            )
            return out["logits"][:, 0]

        logits = jax.lax.map(
            score_chunk,
            (
                flat_TCO.reshape(n_chunks, chunk, 4, 4),
                flat_idx.reshape(n_chunks, chunk),
            ),
        )
        return logits.reshape(n_pad)[:n].reshape(D, M), TCO_init

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _coarse_logits_all(self, chunk, coarse_params, images, K, boxes,
                           mesh_idx, grid):
        return self._coarse_logits_all_impl(
            chunk, coarse_params, images, K, boxes, mesh_idx, grid
        )

    def _coarse_stage_impl(
        self, chunk, coarse_params, images, K, boxes, mesh_idx
    ) -> tuple[Array, Array]:
        """Coarse scoring stage: full 576-grid sweep, or hierarchical
        probe-then-children when cfg.SO3_prune_grid_size is set.

        Hierarchical mode scores the small probe grid, keeps the top
        SO3_prune_keep parents per detection, and scores only their
        Voronoi children from the full grid (~3x fewer renders at 576).
        Final hypotheses are always members of the full grid; padded
        child slots score -inf so they are never selected.

        Returns (logits [D, Mc], TCO_init [D, Mc, 4, 4]).
        """
        cfg = self.cfg
        grid = self.so3_grid
        if not cfg.SO3_prune_grid_size:
            return self._coarse_logits_all_impl(
                chunk, coarse_params, images, K, boxes, mesh_idx, grid
            )
        D = boxes.shape[0]
        probe = self.so3_prune_grid  # [M1, 3, 3]
        logits1, _ = self._coarse_logits_all_impl(
            min(chunk, D * probe.shape[0]), coarse_params, images, K,
            boxes, mesh_idx, probe,
        )
        cand, valid = self._prune_candidates(logits1)
        R_cand = grid[cand]  # [D, P*C, 3, 3]
        logits2, TCO_init = self._coarse_logits_all_impl(
            min(chunk, D * R_cand.shape[1]), coarse_params, images, K,
            boxes, mesh_idx, R_cand,
        )
        return jnp.where(valid, logits2, -jnp.inf), TCO_init

    def _prune_candidates(self, probe_logits: Array):
        """Probe scores [D, M1] -> (candidate grid ids [D, P*C],
        valid [D, P*C]): the Voronoi children of the top-P parents."""
        P = min(self.cfg.SO3_prune_keep, self.so3_prune_grid.shape[0])
        _, top_parents = jax.lax.top_k(probe_logits, P)  # [D, P]
        D = probe_logits.shape[0]
        cand = self.prune_children[top_parents].reshape(D, -1)
        valid = self.prune_child_valid[top_parents].reshape(D, -1)
        return cand, valid

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _coarse_stage(self, chunk, coarse_params, images, K, boxes,
                      mesh_idx):
        return self._coarse_stage_impl(
            chunk, coarse_params, images, K, boxes, mesh_idx
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _init_hypotheses(
        self, K: Array, boxes: Array, mesh_idx: Array, grid: Array
    ) -> Array:
        """TCO_init [D, M, 4, 4] from boxes x grid rotations. `grid` is
        [M, 3, 3] shared or [D, M, 3, 3] per-detection."""
        meshes_d = self.mesh_db.select(mesh_idx)
        points = meshes_d.points

        def init_d(box, pts, R_all):
            return jax.vmap(
                lambda R: tco_init_from_boxes_autodepth_with_R(
                    box[None], pts[None], K, R[None]
                )[0]
            )(R_all)

        if grid.ndim == 3:
            return jax.vmap(lambda b, p: init_d(b, p, grid))(boxes, points)
        return jax.vmap(init_d)(boxes, points, grid)

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _coarse_logits_sharded(
        self,
        chunk: int,
        coarse_params,
        images: Array,  # [1, H, W, C]
        K: Array,  # [1, 3, 3]
        TCO_flat: Array,  # [N, 4, 4] (N divisible by n_devices * chunk)
        idx_flat: Array,  # [N]
    ) -> Array:
        """Hypothesis scoring sharded over the device mesh's 'dp' axis:
        each device scores its slice of the hypothesis batch in `chunk`
        micro-batches; XLA moves no data between chips except the final
        all-gather of logits."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.device_mesh
        model = self.coarse_model_sweep
        mesh_db = self.mesh_db_coarse

        def score_shard(params, db, images_r, K_r, TCO_s, idx_s):
            n_local = TCO_s.shape[0]
            n_chunks = n_local // chunk

            def score_chunk(args):
                TCO_c, idx_c = args
                meshes_c = db.select(idx_c)
                imgs = jnp.broadcast_to(
                    images_r, (chunk,) + images_r.shape[1:]
                )
                K_c = jnp.broadcast_to(K_r, (chunk, 3, 3))
                out = model.apply(
                    params, imgs, K_c, TCO_c, meshes_c,
                    method=PosePredictor.score_views,
                )
                return out["logits"][:, 0]

            return jax.lax.map(
                score_chunk,
                (
                    TCO_s.reshape(n_chunks, chunk, 4, 4),
                    idx_s.reshape(n_chunks, chunk),
                ),
            ).reshape(n_local)

        fn = shard_map(
            score_shard,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("dp"), P("dp")),
            out_specs=P("dp"),
            check_rep=False,
        )
        return fn(coarse_params, mesh_db, images, K, TCO_flat, idx_flat)

    def _refine_impl(
        self,
        chunk: int,
        n_iterations: int,
        refiner_params,
        images: Array,  # [1, H, W, C]
        K: Array,  # [1, 3, 3]
        TCO: Array,  # [N, 4, 4]
        mesh_idx: Array,  # [N]
        mesh_db: BatchedMeshes | None = None,
    ) -> tuple[Array, Array]:
        """Run the scan-refiner on N hypotheses.

        Returns (TCO_refined [N, 4, 4], trajectory [n_iter, N, 4, 4]).
        Analog of forward_refiner (pose_estimator.py:101-215).
        `mesh_db` overrides self.mesh_db (shard_map passes the DB as a
        replicated operand)."""
        mesh_db = self.mesh_db if mesh_db is None else mesh_db
        N = TCO.shape[0]
        n_chunks = (N + chunk - 1) // chunk
        n_pad = n_chunks * chunk
        TCO_p = jnp.concatenate(
            [TCO, jnp.tile(jnp.eye(4, dtype=TCO.dtype), (n_pad - N, 1, 1))]
        )
        idx_p = jnp.concatenate(
            [mesh_idx, jnp.zeros((n_pad - N,), mesh_idx.dtype)]
        )

        def refine_chunk(args):
            TCO_c, idx_c = args
            meshes_c = mesh_db.select(idx_c)
            imgs = jnp.broadcast_to(images, (chunk,) + images.shape[1:])
            K_c = jnp.broadcast_to(K, (chunk, 3, 3))

            def body(T, _):
                out = self.refiner_model.apply(
                    refiner_params,
                    imgs,
                    K_c,
                    T,
                    meshes_c,
                    method=PosePredictor.refine_step,
                )
                return out["TCO_output"], out["TCO_output"]

            T_final, traj = jax.lax.scan(body, TCO_c, None, length=n_iterations)
            return T_final, traj

        T_final, traj = jax.lax.map(
            refine_chunk,
            (
                TCO_p.reshape(n_chunks, chunk, 4, 4),
                idx_p.reshape(n_chunks, chunk),
            ),
        )
        T_final = T_final.reshape(n_pad, 4, 4)[:N]
        traj = jnp.moveaxis(traj, 1, 0).reshape(n_iterations, n_pad, 4, 4)[
            :, :N
        ]
        return T_final, traj

    @functools.partial(jax.jit, static_argnums=(0, 1, 2))
    def _refine(self, chunk, n_iterations, refiner_params, images, K, TCO,
                mesh_idx):
        return self._refine_impl(
            chunk, n_iterations, refiner_params, images, K, TCO, mesh_idx
        )

    @functools.partial(jax.jit, static_argnums=(0, 1, 2))
    def _refine_sharded(
        self, chunk, n_iterations, refiner_params, images, K, TCO_flat,
        idx_flat,
    ):
        """Scan-refiner with the hypothesis axis sharded over the device
        mesh's 'dp' axis (multi-chip analog of _refine; N divisible by
        n_devices * chunk)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        def refine_shard(params, db, images_r, K_r, TCO_s, idx_s):
            return self._refine_impl(
                chunk, n_iterations, params, images_r, K_r, TCO_s, idx_s,
                mesh_db=db,
            )

        fn = shard_map(
            refine_shard,
            mesh=self.device_mesh,
            in_specs=(P(), P(), P(), P(), P("dp"), P("dp")),
            out_specs=(P("dp"), P(None, "dp")),
            check_rep=False,
        )
        return fn(
            refiner_params, self.mesh_db, images, K, TCO_flat, idx_flat
        )

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _rescore_sharded(
        self, chunk, coarse_params, images, K, TCO_flat, idx_flat
    ):
        """Rescoring with the hypothesis axis sharded over 'dp'."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        def score_shard(params, db, images_r, K_r, TCO_s, idx_s):
            return self._rescore_impl(
                chunk, params, images_r, K_r, TCO_s, idx_s, mesh_db=db
            )

        fn = shard_map(
            score_shard,
            mesh=self.device_mesh,
            in_specs=(P(), P(), P(), P(), P("dp"), P("dp")),
            out_specs=P("dp"),
            check_rep=False,
        )
        return fn(
            coarse_params, self.mesh_db_coarse, images, K, TCO_flat,
            idx_flat,
        )

    def _rescore_impl(
        self,
        chunk: int,
        coarse_params,
        images: Array,
        K: Array,
        TCO: Array,  # [N, 4, 4]
        mesh_idx: Array,
        mesh_db: BatchedMeshes | None = None,
    ) -> Array:
        """Coarse logits of given poses (forward_scoring_model,
        pose_estimator.py:217-322). Returns [N]. `mesh_db` overrides
        self.mesh_db_coarse (shard_map operand)."""
        mesh_db = self.mesh_db_coarse if mesh_db is None else mesh_db
        N = TCO.shape[0]
        n_chunks = (N + chunk - 1) // chunk
        n_pad = n_chunks * chunk
        TCO_p = jnp.concatenate(
            [TCO, jnp.tile(jnp.eye(4, dtype=TCO.dtype), (n_pad - N, 1, 1))]
        )
        idx_p = jnp.concatenate(
            [mesh_idx, jnp.zeros((n_pad - N,), mesh_idx.dtype)]
        )

        def score_chunk(args):
            TCO_c, idx_c = args
            meshes_c = mesh_db.select(idx_c)
            imgs = jnp.broadcast_to(images, (chunk,) + images.shape[1:])
            K_c = jnp.broadcast_to(K, (chunk, 3, 3))
            out = self.coarse_model_rescore.apply(
                coarse_params,
                imgs,
                K_c,
                TCO_c,
                meshes_c,
                method=PosePredictor.score_views,
            )
            return out["logits"][:, 0]

        logits = jax.lax.map(
            score_chunk,
            (
                TCO_p.reshape(n_chunks, chunk, 4, 4),
                idx_p.reshape(n_chunks, chunk),
            ),
        )
        return logits.reshape(n_pad)[:N]

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _rescore(self, chunk, coarse_params, images, K, TCO, mesh_idx):
        return self._rescore_impl(chunk, coarse_params, images, K, TCO,
                                  mesh_idx)

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
    def _full_pipeline(
        self,
        chunk_images: int,
        chunk_objects: int,
        n_iterations: int,
        top_k: int,
        coarse_params,
        refiner_params,
        images: Array,
        K: Array,
        boxes: Array,
        mesh_idx: Array,
    ):
        """The ENTIRE pipeline (coarse -> top-K -> scan-refiner ->
        re-score -> top-1) as one XLA program: no host round-trips
        between phases (the per-phase path keeps them for timing parity
        with the reference's CudaTimer splits). The rotation vocabulary
        is self.so3_grid (plus the probe grid in hierarchical mode)."""
        D = boxes.shape[0]
        logits, TCO_init = self._coarse_stage_impl(
            chunk_images, coarse_params, images, K, boxes, mesh_idx
        )
        top_logits, top_ids = jax.lax.top_k(logits, top_k)
        TCO_topk = jnp.take_along_axis(
            TCO_init, top_ids[..., None, None], axis=1
        )
        N = D * top_k
        TCO_flat = TCO_topk.reshape(N, 4, 4)
        idx_flat = jnp.repeat(mesh_idx, top_k)
        TCO_refined, traj = self._refine_impl(
            min(chunk_objects, N), n_iterations, refiner_params,
            images, K, TCO_flat, idx_flat,
        )
        pose_logits = self._rescore_impl(
            min(chunk_objects, N), coarse_params, images, K,
            TCO_refined, idx_flat,
        )
        pose_logits_dk = pose_logits.reshape(D, top_k)
        best = jnp.argmax(pose_logits_dk, axis=1)
        TCO_best = jnp.take_along_axis(
            TCO_refined.reshape(D, top_k, 4, 4),
            best[:, None, None, None],
            axis=1,
        )[:, 0]
        best_logit = jnp.take_along_axis(
            pose_logits_dk, best[:, None], axis=1
        )[:, 0]
        return {
            "TCO_best": TCO_best,
            "best_logit": best_logit,
            "logits": logits,
            "TCO_init": TCO_init,
            "top_ids": top_ids,
            "traj": traj,
            "TCO_refined": TCO_refined,
            "pose_logits_dk": pose_logits_dk,
        }

    def fused_pipeline_cost_analysis(self, observation, detections) -> dict:
        """XLA cost analysis (flops/bytes) of the compiled fused pipeline
        for the given observation/detections shapes. Used by bench.py for
        an MFU estimate; mirrors run_inference_pipeline's argument prep."""
        cfg = self.cfg
        D = cfg.max_detections
        labels = list(detections.infos["label"])
        mesh_idx = _pad_to(
            np.asarray(self.mesh_db.label_to_index(labels), np.int32), D
        )
        boxes = _pad_to(np.asarray(detections.bboxes, np.float32), D)
        grid = self.so3_grid
        chunk = min(cfg.bsz_images, D * grid.shape[0])
        # .lower on the unbound jitted function (instance binding does not
        # forward jax.stages methods).
        lowered = type(self)._full_pipeline.lower(
            self,
            chunk,
            min(cfg.bsz_objects, D * cfg.n_pose_hypotheses),
            cfg.n_refiner_iterations,
            cfg.n_pose_hypotheses,
            self.coarse_params,
            self.refiner_params,
            jnp.asarray(observation.images),
            jnp.asarray(observation.K),
            jnp.asarray(boxes),
            jnp.asarray(mesh_idx),
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        return dict(cost)

    def fused_pipeline_flops_estimate(self, observation) -> dict:
        """Trip-count-corrected model-FLOPs estimate of one fused
        pipeline call (per image).

        XLA's cost analysis counts a `lax.map` / `lax.scan` BODY once,
        so `fused_pipeline_cost_analysis` undercounts the real work by
        the chunk trip counts (measured ~10x at D=8). This lowers each
        per-chunk sub-program separately — host-side tracing only, no
        device compile — and multiplies by its trip count. Pallas render
        kernels are opaque custom calls with zero reported flops either
        way, so this is the CNN model-FLOPs numerator (the standard MFU
        definition).

        Returns {"flops": total, "flops_coarse": ..., "flops_refine":
        ..., "flops_rescore": ...} for one image at cfg.max_detections.
        """
        cfg = self.cfg
        D = cfg.max_detections
        img_sds = jax.ShapeDtypeStruct(
            tuple(observation.images.shape[1:]), jnp.float32
        )

        def _sds(tree):
            return jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a),
                                               jnp.result_type(a)), tree
            )

        def _flops(fn, *args):
            lowered = jax.jit(fn).lower(*args)
            ca = lowered.cost_analysis()
            if ca is None:
                # The axon (TPU tunnel) client has no host-side HLO cost
                # analysis; the in-process CPU client's is
                # backend-independent on unoptimized HLO. Mosaic only
                # targets TPU, so lower the Pallas render in interpret
                # mode (its emulation ops are a rounding error next to
                # the CNN conv/matmul flops being counted).
                from ..ops.rasterizer_tiled import force_interpret

                with force_interpret():
                    # Fresh closure: the first lower() above already
                    # traced `fn` and cached its jaxpr with the Pallas
                    # interpret=False param baked in; re-jitting the
                    # same function object would reuse that trace and
                    # bypass force_interpret.
                    ca = (jax.jit(lambda *a: fn(*a), backend="cpu")
                          .lower(*args).cost_analysis())
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)) if ca else 0.0

        _cache: dict[tuple, float] = {}

        def score_chunk_flops(model, params, db, chunk):
            key = ("score", id(model), id(db), chunk)
            if key not in _cache:
                meshes_c = _sds(db.select(jnp.zeros((chunk,), jnp.int32)))

                def fn(p, imgs, K_c, TCO_c, m):
                    return model.apply(
                        p, imgs, K_c, TCO_c, m,
                        method=PosePredictor.score_views,
                    )["logits"]

                _cache[key] = _flops(
                    fn,
                    _sds(params),
                    jax.ShapeDtypeStruct((chunk,) + img_sds.shape,
                                         img_sds.dtype),
                    jax.ShapeDtypeStruct((chunk, 3, 3), jnp.float32),
                    jax.ShapeDtypeStruct((chunk, 4, 4), jnp.float32),
                    meshes_c,
                )
            return _cache[key]

        def refine_chunk_flops(chunk):
            meshes_c = _sds(
                self.mesh_db.select(jnp.zeros((chunk,), jnp.int32))
            )

            def fn(p, imgs, K_c, TCO_c, m):
                return self.refiner_model.apply(
                    p, imgs, K_c, TCO_c, m,
                    method=PosePredictor.refine_step,
                )["TCO_output"]

            return _flops(
                fn,
                _sds(self.refiner_params),
                jax.ShapeDtypeStruct((chunk,) + img_sds.shape,
                                     img_sds.dtype),
                jax.ShapeDtypeStruct((chunk, 3, 3), jnp.float32),
                jax.ShapeDtypeStruct((chunk, 4, 4), jnp.float32),
                meshes_c,
            )

        def sweep_flops(n_hyp):
            """Coarse sweep over D*n_hyp hypotheses (padded chunking,
            exactly _coarse_logits_all_impl's trip count)."""
            n = D * n_hyp
            chunk = min(cfg.bsz_images, n)
            trips = -(-n // chunk)
            return trips * score_chunk_flops(
                self.coarse_model_sweep, self.coarse_params,
                self.mesh_db_coarse, chunk,
            )

        if cfg.SO3_prune_grid_size:
            f_coarse = sweep_flops(self.so3_prune_grid.shape[0])
            f_coarse += sweep_flops(self.prune_children[0].size
                                    * min(cfg.SO3_prune_keep,
                                          self.so3_prune_grid.shape[0]))
        else:
            f_coarse = sweep_flops(self.so3_grid.shape[0])

        N = D * cfg.n_pose_hypotheses
        chunk_o = min(cfg.bsz_objects, N)
        trips_o = -(-N // chunk_o)
        f_refine = (trips_o * cfg.n_refiner_iterations
                    * refine_chunk_flops(chunk_o))
        f_rescore = trips_o * score_chunk_flops(
            self.coarse_model_rescore, self.coarse_params,
            self.mesh_db_coarse, chunk_o,
        )
        return {
            "flops": f_coarse + f_refine + f_rescore,
            "flops_coarse": f_coarse,
            "flops_refine": f_refine,
            "flops_rescore": f_rescore,
        }

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _run_external_init(
        self, observation, detections, n_iter: int, do_depth: bool
    ) -> tuple[PandasTensorCollection, dict]:
        """Refine externally-provided initial poses (ModelNet protocol)."""
        timing: dict[str, float] = {}
        t_start = time.monotonic()
        D_real = len(detections)
        labels = list(detections.infos["label"])
        mesh_idx = jnp.asarray(self.mesh_db.label_to_index(labels))
        images = jnp.asarray(observation.images)
        K = jnp.asarray(observation.K)
        TCO_init = jnp.asarray(detections.TCO_init, jnp.float32)

        t0 = time.monotonic()
        TCO_refined, traj = self._refine(
            min(self.cfg.bsz_objects, D_real),
            n_iter,
            self.refiner_params,
            images,
            K,
            TCO_init,
            mesh_idx,
        )
        TCO_refined.block_until_ready()
        timing["refiner"] = time.monotonic() - t0

        t0 = time.monotonic()
        logits = self._rescore(
            min(self.cfg.bsz_objects, D_real),
            self.coarse_params,
            images,
            K,
            TCO_refined,
            mesh_idx,
        )
        logits.block_until_ready()
        timing["scoring"] = time.monotonic() - t0

        poses_np = np.asarray(TCO_refined)
        depth_extra = None
        if do_depth and self.depth_refiner is not None:
            preds_tmp = PandasTensorCollection(
                detections.infos.copy(), poses=poses_np
            )
            refined, depth_extra = self.depth_refiner.refine_poses(
                preds_tmp, depth=observation.depth, K=observation.K
            )
            poses_np = np.asarray(refined.poses)

        timing["total"] = time.monotonic() - t_start
        self.timing_ = timing
        infos = detections.infos.copy()
        infos["pose_logit"] = np.asarray(logits)
        infos["pose_score"] = np.asarray(jax.nn.sigmoid(logits))
        data = PandasTensorCollection(infos, poses=poses_np)
        extra = {
            "timing": timing,
            "refiner": {"trajectory": np.asarray(traj)},
        }
        if depth_extra is not None:
            extra["depth_refiner"] = depth_extra
        return data, extra

    def run_inference_pipeline(
        self,
        observation,
        detections: PandasTensorCollection | None = None,
        run_detector: bool | None = None,
        n_refiner_iterations: int | None = None,
        n_pose_hypotheses: int | None = None,
        keep_all_coarse_outputs: bool = False,
        run_depth_refiner: bool | None = None,
    ) -> tuple[PandasTensorCollection, dict]:
        """Full pipeline on ONE observation (pose_estimator.py:510-641).

        Args:
          observation: `data.types.ObservationTensor` with batch size 1.
          detections: DetectionsType (infos.label + bboxes [D, 4]); if
            None and `run_detector`, boxes come from `self.detector`
            (pose_estimator.py:543-554).
        Returns:
          (PoseEstimatesType with one row per detection, extra_data dict).
        """
        cfg = self.cfg
        n_iter = n_refiner_iterations or cfg.n_refiner_iterations
        top_k = n_pose_hypotheses or cfg.n_pose_hypotheses
        do_depth = (
            cfg.run_depth_refiner
            if run_depth_refiner is None
            else run_depth_refiner
        )
        assert observation.batch_size == 1
        if detections is None:
            assert run_detector and self.detector is not None
            detections = self.detector.get_detections(observation)
        assert len(detections) > 0, "no detections"
        if cfg.coarse_estimation_type == "external":
            # ModelNet protocol: refine a provided initial pose, skip the
            # SO(3)-grid coarse stage (pose_estimator.py external path;
            # prediction_runner.py:96-118 TWO_init).
            assert "TCO_init" in detections.tensors, (
                "external coarse estimation needs detections.TCO_init"
            )
            return self._run_external_init(
                observation, detections, n_iter, do_depth
            )

        timing: dict[str, float] = {}
        t_start = time.monotonic()

        if len(detections) > cfg.max_detections:
            # Keep the top-scoring max_detections rows (the reference filters
            # detections before the pipeline, inference/utils.py:174-196);
            # infos and tensors must stay consistent with the padded arrays.
            infos_d = detections.infos
            if "score" in infos_d.columns:
                order = np.argsort(-infos_d["score"].to_numpy(), kind="stable")
            else:
                order = np.arange(len(infos_d))
            keep = np.sort(order[: cfg.max_detections])
            detections = detections[keep]
        D_real = len(detections)
        D = cfg.max_detections
        labels = list(detections.infos["label"])
        mesh_idx_real = np.asarray(
            self.mesh_db.label_to_index(labels), np.int32
        )
        boxes = _pad_to(np.asarray(detections.bboxes, np.float32), D)
        mesh_idx = _pad_to(mesh_idx_real, D)

        images = jnp.asarray(observation.images)
        K = jnp.asarray(observation.K)
        grid = self.so3_grid
        M = grid.shape[0]
        chunk = min(cfg.bsz_images, D * M)

        if cfg.fused_pipeline and self.device_mesh is None and not (
            do_depth and self.depth_refiner is not None
        ):
            # One XLA program, no host syncs between phases.
            out = self._full_pipeline(
                chunk,
                min(cfg.bsz_objects, D * top_k),
                n_iter,
                top_k,
                self.coarse_params,
                self.refiner_params,
                images,
                K,
                jnp.asarray(boxes),
                jnp.asarray(mesh_idx),
            )
            jax.block_until_ready(out)
            timing["total"] = time.monotonic() - t_start
            self.timing_ = timing
            infos = detections.infos.copy()
            best_logit = np.asarray(out["best_logit"])[:D_real]
            infos["pose_logit"] = best_logit
            infos["pose_score"] = np.asarray(
                jax.nn.sigmoid(out["best_logit"])
            )[:D_real]
            data = PandasTensorCollection(
                infos, poses=np.asarray(out["TCO_best"])[:D_real]
            )
            extra = {
                "timing": timing,
                "coarse": {
                    "logits": np.asarray(out["logits"])[:D_real],
                    "TCO_init": np.asarray(out["TCO_init"])[:D_real],
                    "top_ids": np.asarray(out["top_ids"])[:D_real],
                },
                "refiner": {
                    "trajectory": np.asarray(out["traj"]).reshape(
                        n_iter, D, top_k, 4, 4
                    )[:, :D_real],
                    "TCO_refined": np.asarray(
                        out["TCO_refined"]
                    ).reshape(D, top_k, 4, 4)[:D_real],
                    "pose_logits": np.asarray(out["pose_logits_dk"])[
                        :D_real
                    ],
                },
            }
            if keep_all_coarse_outputs:
                extra["coarse"]["all_TCO"] = extra["coarse"]["TCO_init"]
            return data, extra

        # --- coarse ---------------------------------------------------
        t0 = time.monotonic()
        if self.device_mesh is not None:
            # Hypothesis axis sharded across chips (shard_map over 'dp').
            n_dev = int(self.device_mesh.devices.size)

            def sharded_scores(TCO_dm):
                """Score [D, M', 4, 4] hypotheses over the mesh."""
                D_, M_ = TCO_dm.shape[:2]
                n = D_ * M_
                per_dev = -(-n // (n_dev * chunk)) * chunk
                n_pad = per_dev * n_dev
                flat_TCO = jnp.concatenate(
                    [
                        TCO_dm.reshape(n, 4, 4),
                        jnp.tile(
                            jnp.eye(4, dtype=TCO_dm.dtype),
                            (n_pad - n, 1, 1),
                        ),
                    ]
                )
                flat_idx = jnp.concatenate(
                    [
                        jnp.repeat(jnp.asarray(mesh_idx), M_),
                        jnp.zeros((n_pad - n,), jnp.int32),
                    ]
                )
                return self._coarse_logits_sharded(
                    chunk, self.coarse_params, images, K, flat_TCO,
                    flat_idx,
                )[:n].reshape(D_, M_)

            if cfg.SO3_prune_grid_size:
                # Hierarchical mode, sharded: probe sweep -> top parents
                # -> children sweep; both sweeps ride the 'dp' axis.
                probe_TCO = self._init_hypotheses(
                    K, jnp.asarray(boxes), jnp.asarray(mesh_idx),
                    self.so3_prune_grid,
                )
                cand, valid = self._prune_candidates(
                    sharded_scores(probe_TCO)
                )
                TCO_init = self._init_hypotheses(
                    K, jnp.asarray(boxes), jnp.asarray(mesh_idx),
                    grid[cand],
                )
                logits = jnp.where(
                    valid, sharded_scores(TCO_init), -jnp.inf
                )
            else:
                TCO_init = self._init_hypotheses(
                    K, jnp.asarray(boxes), jnp.asarray(mesh_idx), grid
                )
                logits = sharded_scores(TCO_init)
        else:
            logits, TCO_init = self._coarse_stage(
                chunk,
                self.coarse_params,
                images,
                K,
                jnp.asarray(boxes),
                jnp.asarray(mesh_idx),
            )
        logits.block_until_ready()
        timing["coarse"] = time.monotonic() - t0

        # --- top-K ----------------------------------------------------
        top_logits, top_ids = jax.lax.top_k(logits, top_k)  # [D, K]
        TCO_topk = jnp.take_along_axis(
            TCO_init, top_ids[..., None, None], axis=1
        )  # [D, K, 4, 4]

        # --- refiner --------------------------------------------------
        t0 = time.monotonic()
        N = D * top_k
        TCO_flat = TCO_topk.reshape(N, 4, 4)
        idx_flat = jnp.repeat(jnp.asarray(mesh_idx), top_k)
        if self.device_mesh is not None:
            # Hypothesis axis stays sharded over 'dp' through the
            # refiner and rescoring too (coarse alone sharded leaves
            # all-but-one chip idle for the tail phases).
            n_dev = int(self.device_mesh.devices.size)
            chunk_r = min(cfg.bsz_objects, -(-N // n_dev))
            per_dev = -(-N // (n_dev * chunk_r)) * chunk_r
            n_pad = per_dev * n_dev

            def pad_poses(T):
                return jnp.concatenate(
                    [T, jnp.tile(jnp.eye(4, dtype=T.dtype), (n_pad - N, 1, 1))]
                )

            TCO_s = pad_poses(TCO_flat)
            idx_s = jnp.concatenate(
                [idx_flat, jnp.zeros((n_pad - N,), jnp.int32)]
            )
            TCO_ref_p, traj_p = self._refine_sharded(
                chunk_r, n_iter, self.refiner_params, images, K, TCO_s,
                idx_s,
            )
            TCO_refined = TCO_ref_p[:N]
            traj = traj_p[:, :N]
            TCO_refined.block_until_ready()
            timing["refiner"] = time.monotonic() - t0

            t0 = time.monotonic()
            pose_logits = self._rescore_sharded(
                chunk_r, self.coarse_params, images, K,
                pad_poses(TCO_refined), idx_s,
            )[:N]
        else:
            TCO_refined, traj = self._refine(
                min(cfg.bsz_objects, N),
                n_iter,
                self.refiner_params,
                images,
                K,
                TCO_flat,
                idx_flat,
            )
            TCO_refined.block_until_ready()
            timing["refiner"] = time.monotonic() - t0

            # --- re-score refined hypotheses ---------------------------
            t0 = time.monotonic()
            pose_logits = self._rescore(
                min(cfg.bsz_objects, N),
                self.coarse_params,
                images,
                K,
                TCO_refined,
                idx_flat,
            )
        pose_logits.block_until_ready()
        timing["scoring"] = time.monotonic() - t0

        # --- top-1 per detection ---------------------------------------
        pose_logits_dk = pose_logits.reshape(D, top_k)
        best = jnp.argmax(pose_logits_dk, axis=1)  # [D]
        TCO_best = jnp.take_along_axis(
            TCO_refined.reshape(D, top_k, 4, 4),
            best[:, None, None, None],
            axis=1,
        )[:, 0]
        best_logit = jnp.take_along_axis(
            pose_logits_dk, best[:, None], axis=1
        )[:, 0]

        # --- optional depth refinement (pose_estimator.py:616-621) ------
        depth_extra = None
        if do_depth and self.depth_refiner is not None:
            t0 = time.monotonic()
            assert observation.channels == 4, "depth refiner needs depth"
            import pandas as pd  # noqa: F401 (local)

            infos_tmp = detections.infos.copy()
            preds_tmp = PandasTensorCollection(
                infos_tmp, poses=np.asarray(TCO_best)[:D_real]
            )
            refined, depth_extra = self.depth_refiner.refine_poses(
                preds_tmp,
                depth=observation.depth,
                K=observation.K,
            )
            TCO_best = jnp.asarray(
                np.concatenate(
                    [refined.poses, np.asarray(TCO_best)[D_real:]], axis=0
                )
            )
            timing["depth_refiner"] = time.monotonic() - t0

        timing["total"] = time.monotonic() - t_start
        self.timing_ = timing

        # --- assemble outputs (pandas only here) ------------------------
        poses_np = np.asarray(TCO_best)[:D_real]
        scores_np = jax.nn.sigmoid(best_logit)
        infos = detections.infos.copy()
        infos["pose_score"] = np.asarray(scores_np)[:D_real]
        infos["pose_logit"] = np.asarray(best_logit)[:D_real]
        data = PandasTensorCollection(infos, poses=poses_np)

        extra: dict[str, Any] = {
            "timing": timing,
            "coarse": {
                "logits": np.asarray(logits)[:D_real],
                "TCO_init": np.asarray(TCO_init)[:D_real],
                "top_ids": np.asarray(top_ids)[:D_real],
            },
            "refiner": {
                "trajectory": np.asarray(traj).reshape(
                    n_iter, D, top_k, 4, 4
                )[:, :D_real],
                "TCO_refined": np.asarray(TCO_refined).reshape(D, top_k, 4, 4)[
                    :D_real
                ],
                "pose_logits": np.asarray(pose_logits_dk)[:D_real],
            },
        }
        if keep_all_coarse_outputs:
            extra["coarse"]["all_TCO"] = np.asarray(TCO_init)[:D_real]
        if depth_extra is not None:
            extra["depth_refiner"] = depth_extra
        return data, extra
