"""PosePredictor: the single render-and-compare network (coarse + refiner).

TPU-native re-design of the reference's `PosePredictor` (megapose6d:
src/megapose/models/pose_rigid.py:81-708). One flax module serves both
roles, configured by flags exactly like the reference:
  - refiner: `predict_pose_update=True`, V rendered views, 9D pose head
    applied about the reference point (pose_rigid.py:305-312, 498-604);
  - coarse:  `predict_rendered_views_logits=True`, 1 view, logits head +
    sigmoid scores (pose_rigid.py:606-708).

Differences from the reference, by design:
  - `refine_step`/`score_views` are single-iteration pure functions over
    NHWC arrays; the iteration loop is a `lax.scan` in the caller
    (inference/pose_estimator.py), so crop -> render -> CNN -> SE(3) update
    compiles into ONE XLA program and never leaves the device. The
    reference crosses a process boundary at every render
    (panda3d_batch_renderer.py:217-282).
  - Object identity is a static mesh-index array into the padded
    `BatchedMeshes` DB, not a list of label strings.
  - Rendering uses the in-graph rasterizer (`ops/rasterizer.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..meshes.mesh_db import BatchedMeshes
from ..ops import cropping, multiview, rasterizer, rasterizer_tiled
from ..ops.camera import (
    get_K_crop_resize,
    get_K_resize,
    masked_boxes_from_uv,
    project_points_robust,
)
from ..ops.pose_init import pose_update_with_reference_point
from ..ops.se3 import normalize_T, rotmat_from_ortho6d
from .backbones import make_backbone

Array = jax.Array

# Init-only render bypass (see skip_render_for_init): parameter
# initialization never depends on pixel VALUES (initializers are a
# function of shapes + rng only), so `model.init` can skip the
# rasterizer and feed zeros of the render's static shape. This lets
# init run on the host CPU in seconds; the real eager init executed
# every op over the TPU tunnel (~6 min per script invocation).
_SKIP_RENDER = False


class skip_render_for_init:
    """Context manager: render_views returns zeros of the correct shape
    instead of rasterizing. ONLY for flax .init — param values are
    identical (same rng, same shapes), activations are not."""

    def __enter__(self):
        global _SKIP_RENDER
        self._prev = _SKIP_RENDER
        _SKIP_RENDER = True
        return self

    def __exit__(self, *exc):
        global _SKIP_RENDER
        _SKIP_RENDER = self._prev
        return False


@dataclasses.dataclass(frozen=True)
class PosePredictorConfig:
    """Static model configuration (analog of the flags wired in
    training/pose_models_cfg.py:90-138)."""

    backbone: str = "resnet34"
    render_size: tuple[int, int] = (240, 320)
    # Rasterize rendered views at this (lower) resolution and bilinearly
    # upsample to `render_size` before the CNN (None = rasterize at
    # render_size). The CNN input shape — and therefore the param tree —
    # is unchanged, so trained checkpoints apply as-is; only the raster
    # cost drops (it is linear in pixel tiles). Used for the coarse
    # SO(3)-sweep, where ~70% of pipeline time is rendering and the
    # classifier only needs silhouette-level fidelity
    # (InferenceConfig.coarse_render_size). TPU-first lever with no
    # reference analog (the Panda3D farm renders everything at 240x320,
    # panda3d_batch_renderer.py:61-71).
    render_at: tuple[int, int] | None = None
    multiview_type: str = "TCO+front_3views"
    views_inplane_rotations: bool = False
    remove_TCO_rendering: bool = False
    predict_pose_update: bool = True
    predict_rendered_views_logits: bool = False
    render_normals: bool = True
    n_rendered_views: int = 1
    input_depth: bool = False
    render_depth: bool = False
    depth_normalization_type: str = "none"
    n_features: int = 512
    compute_dtype: str = "float32"  # "bfloat16" on TPU
    crop_lamb: float = 1.4
    mv_crop_points: int = 200  # points for multiview crop boxes (ref: 200)
    renderer: str = "tiled"  # "tiled" (Pallas) | "scan" (XLA baseline)
    face_chunk: int = 64  # scan renderer face chunk
    tile_face_chunk: int = 16  # tiled renderer face-chunk granularity
    # Hypotheses per Pallas program (amortizes per-program fixed cost on
    # mostly-empty tiles). Keep hyp_pack * n_faces under ~16k; the kernel
    # silently falls back to 1 when B*V is not divisible.
    tile_hyp_pack: int = 1
    backface_cull: bool = True  # meshes from MeshDataBase are winding-normalized
    z_near: float = 0.01

    @property
    def n_inputs(self) -> int:
        """Input channel count (pose_models_cfg.py:95-103)."""
        render_c = 3 + 3 * self.render_normals + self.render_depth
        return (3 + self.input_depth) + render_c * self.n_rendered_views


def make_refiner_config(**overrides) -> PosePredictorConfig:
    """Paper refiner: 4 views (TCO+front_3views), normals, 9D head
    (run_megapose_training.py:make_refiner_cfg:120-129)."""
    kw: dict[str, Any] = dict(
        n_rendered_views=4,
        multiview_type="TCO+front_3views",
        render_normals=True,
        predict_pose_update=True,
        predict_rendered_views_logits=False,
    )
    kw.update(overrides)
    return PosePredictorConfig(**kw)


def make_coarse_config(**overrides) -> PosePredictorConfig:
    """Paper coarse model: 1 view, logits head
    (run_megapose_training.py:make_coarse_cfg:132-143)."""
    kw: dict[str, Any] = dict(
        n_rendered_views=1,
        render_normals=True,
        predict_pose_update=False,
        predict_rendered_views_logits=True,
    )
    kw.update(overrides)
    return PosePredictorConfig(**kw)


class PosePredictor(nn.Module):
    cfg: PosePredictorConfig

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        self.backbone = make_backbone(
            self.cfg.backbone, self.cfg.n_features, dtype=dtype
        )
        if self.cfg.predict_pose_update:
            # Identity-update initialization: bias = ortho6d identity
            # (x=(1,0,0), y=(0,1,0)) + vxvy=0 + vz=1, so an untrained
            # head leaves the pose unchanged. The reference's zero-init
            # head outputs vz~0, which collapses depth through the
            # update's multiplicative z (ztgt = vz * zsrc) and costs
            # thousands of Adam steps just to drift vz to 1.
            identity_bias = jnp.asarray(
                [1, 0, 0, 0, 1, 0, 0, 0, 1], jnp.float32
            )
            # Small (not zero) kernel: a zeros kernel starves the backbone
            # of rotation-head gradient at init, and the backbone settles
            # into a translation-cue basin where dR stays ~identity (the
            # orientation loss term plateaus while xy/z learn). Fan-in
            # scaled so the initial output spread is ~0.03 regardless of
            # feature width (a fixed stddev blows up vz with wide spatial
            # feature heads: vz<=0 samples hit the update's z clip and go
            # gradient-dead). Keeps the initial update ~identity
            # (bias-dominated) while coupling feature learning to the
            # rotation objective from step 0 — the reference's default
            # Linear init does the same coupling (pose_rigid.py:305-312).
            self.pose_fc = nn.Dense(
                9,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.variance_scaling(
                    1e-3, "fan_in", "truncated_normal"
                ),
                bias_init=lambda key, shape, dtype=jnp.float32: identity_bias,
            )
        if self.cfg.predict_rendered_views_logits:
            self.views_logits_fc = nn.Dense(
                self.cfg.n_rendered_views, param_dtype=jnp.float32
            )

    # ------------------------------------------------------------------
    # building blocks
    # ------------------------------------------------------------------

    def net_forward(self, x: Array) -> dict[str, Array]:
        """Backbone + heads (pose_rigid.py:314-334). `x: [B, H, W, C]`."""
        feats = self.backbone(x)
        out = {}
        if self.cfg.predict_pose_update:
            out["pose"] = self.pose_fc(feats)
        if self.cfg.predict_rendered_views_logits:
            out["renderings_logits"] = self.views_logits_fc(feats)
        return out

    def crop_inputs(
        self, images: Array, K: Array, TCO: Array, tCR: Array, meshes: BatchedMeshes
    ) -> tuple[Array, Array, Array, Array]:
        """Crop observation around the projected hypothesis
        (pose_rigid.py:180-247). `images: [B, H, W, C]` NHWC."""
        points = meshes.points  # [B, P, 3]
        uv = project_points_robust(points, K, TCO)
        boxes_rend = masked_boxes_from_uv(uv, jnp.ones(uv.shape[:2], bool))
        boxes_crop, images_cropped = cropping.deepim_crops_robust(
            images=images,
            obs_boxes=boxes_rend,
            K=K,
            TCO_pred=TCO,
            tCR=tCR,
            O_vertices=points,
            output_size=self.cfg.render_size,
            lamb=self.cfg.crop_lamb,
            depth_dim=3 if self.cfg.input_depth else None,
        )
        K_crop = get_K_crop_resize(
            K, boxes_crop, images.shape[1:3], self.cfg.render_size
        )
        return images_cropped, K_crop, boxes_rend, boxes_crop

    def compute_crops_multiview(
        self, im_hw: tuple[int, int], K: Array, TCV_O: Array, tCV_R: Array,
        meshes: BatchedMeshes,
    ) -> Array:
        """Intrinsics of the fictive per-view crop cameras
        (pose_rigid.py:249-303). Returns `[B, V, 3, 3]`."""
        B, V = TCV_O.shape[:2]
        pts = meshes.points[:, :: max(1, meshes.points.shape[1] // self.cfg.mv_crop_points)]
        pts_mv = jnp.repeat(pts, V, axis=0)
        K_mv = jnp.repeat(K, V, axis=0)
        TCV_O_f = TCV_O.reshape(B * V, 4, 4)
        tCV_R_f = tCV_R.reshape(B * V, 3)
        uv = project_points_robust(pts_mv, K_mv, TCV_O_f)
        boxes_rend = masked_boxes_from_uv(uv, jnp.ones(uv.shape[:2], bool))
        boxes_crop, _ = cropping.deepim_crops_robust(
            images=jnp.zeros((B * V,) + im_hw + (1,), K.dtype),
            obs_boxes=boxes_rend,
            K=K_mv,
            TCO_pred=TCV_O_f,
            tCR=tCV_R_f,
            O_vertices=pts_mv,
            output_size=self.cfg.render_size,
            lamb=self.cfg.crop_lamb,
            return_crops=False,
        )
        K_crop = get_K_crop_resize(
            K_mv, boxes_crop, im_hw, self.cfg.render_size
        )
        return K_crop.reshape(B, V, 3, 3)

    def render_views(
        self,
        meshes: BatchedMeshes,
        TCV_O: Array,
        KV: Array,
        tCR: Array,
        ambient: Array | None = None,
    ) -> Array:
        """Render V views and stack channels
        (pose_rigid.py:render_images_multiview:336-408 + normalize_images
        :410-496). Returns `[B, H, W, V * C_render]`."""
        cfg = self.cfg
        B, V = TCV_O.shape[:2]
        if _SKIP_RENDER:
            H, W = cfg.render_size
            c_render = 3 + 3 * cfg.render_normals + cfg.render_depth
            return jnp.zeros((B, H, W, V * c_render), jnp.float32)
        # Low-res raster + upsample (see PosePredictorConfig.render_at).
        ras_hw = tuple(cfg.render_at) if cfg.render_at else tuple(cfg.render_size)
        if ras_hw != tuple(cfg.render_size):
            KV = get_K_resize(KV, cfg.render_size, ras_hw)
        mesh_mv = jax.tree.map(lambda a: jnp.repeat(a, V, axis=0), meshes)
        if ambient is not None:
            light_ambient = jnp.repeat(ambient, V, axis=0)
            light_point = jnp.zeros_like(light_ambient)
        elif cfg.render_normals:
            # Normals configs render with pure ambient light
            # (pose_rigid.py:374-376).
            light_ambient, light_point = 1.0, 0.0
        else:
            light_ambient, light_point = 0.1, 0.4
        render_args = (
            mesh_mv.vertices,
            mesh_mv.normals,
            mesh_mv.colors,
            mesh_mv.faces,
            mesh_mv.face_valid,
            TCV_O.reshape(B * V, 4, 4),
            KV.reshape(B * V, 3, 3),
            ras_hw,
        )
        tex_kw = {}
        if (
            mesh_mv.textures is not None
            and mesh_mv.uvs is not None
            and mesh_mv.has_tex is not None
        ):
            # Per-pixel texture sampling (Panda3D texture-mapping parity,
            # panda3d_scene_renderer.py:298-358).
            tex_kw = dict(
                uvs=mesh_mv.uvs,
                textures=mesh_mv.textures,
                has_tex=mesh_mv.has_tex,
            )
        if cfg.renderer == "tiled":
            out = rasterizer_tiled.render_meshes_tiled(
                *render_args,
                z_near=cfg.z_near,
                chunk=cfg.tile_face_chunk,
                hyp_pack=cfg.tile_hyp_pack,
                backface_cull=cfg.backface_cull,
                light_ambient=light_ambient,
                light_point=light_point,
                # The Pallas kernel runs compiled on TPU, interpreted on
                # host CPU (tests / virtual-device dryruns).
                interpret=jax.default_backend() == "cpu",
                **tex_kw,
            )
        else:
            out = rasterizer.render_meshes(
                *render_args,
                z_near=cfg.z_near,
                chunk=cfg.face_chunk,
                light_ambient=light_ambient,
                light_point=light_point,
                **tex_kw,
            )
        chans = [out.rgb]
        if cfg.render_normals:
            chans.append(out.normals)
        if cfg.render_depth:
            depth = self.normalize_depth(
                out.depth[..., None], jnp.repeat(tCR, V, axis=0)
            )
            chans.append(depth)
        r = jnp.concatenate(chans, axis=-1)  # [B*V, h, w, Cr]
        H, W = cfg.render_size
        if ras_hw != (H, W):
            r = jax.image.resize(
                r, (r.shape[0], H, W, r.shape[-1]), method="bilinear"
            )
        r = r.reshape(B, V, H, W, -1)
        return jnp.moveaxis(r, 1, 3).reshape(B, H, W, -1)

    def normalize_depth(self, depth: Array, tCR: Array) -> Array:
        """Depth normalization by anchor distance (pose_rigid.py:462-496).
        `depth: [B, ..., 1]`, `tCR: [B, 3]`."""
        t = self.cfg.depth_normalization_type
        z = tCR[:, 2].reshape((-1,) + (1,) * (depth.ndim - 1))
        if t == "tCR_scale":
            return depth / z
        if t == "tCR_scale_clamp_center":
            return jnp.clip(depth / z, 0.0, 2.0) - 1.0
        if t == "tCR_center_clamp":
            return jnp.clip(depth - z, -2.0, 2.0)
        if t == "none":
            return depth
        raise ValueError(f"unknown depth_normalization_type: {t}")

    def normalize_obs(self, images_crop: Array, tCR: Array) -> Array:
        if self.cfg.input_depth:
            depth = self.normalize_depth(images_crop[..., 3:4], tCR)
            images_crop = jnp.concatenate([images_crop[..., :3], depth], -1)
        return images_crop

    def update_pose(
        self, TCO: Array, K_crop: Array, pose_outputs: Array, tCR: Array
    ) -> Array:
        """Apply the 9D head output (pose_rigid.py:305-312)."""
        dR = rotmat_from_ortho6d(pose_outputs[..., 0:6])
        vxvyvz = pose_outputs[..., 6:9]
        return pose_update_with_reference_point(TCO, K_crop, vxvyvz, dR, tCR)

    # ------------------------------------------------------------------
    # public steps
    # ------------------------------------------------------------------

    def refine_step(
        self,
        images: Array,  # [B, H, W, 3(+1)] float in [0,1] (+depth meters)
        K: Array,  # [B, 3, 3]
        TCO_input: Array,  # [B, 4, 4]
        meshes: BatchedMeshes,  # selected, leading dim B
        ambient: Array | None = None,
    ) -> dict[str, Array]:
        """One DeepIM iteration (pose_rigid.py:forward:498-604)."""
        cfg = self.cfg
        if not cfg.input_depth:
            images = images[..., :3]
        TCO_input = normalize_T(jax.lax.stop_gradient(TCO_input))
        # Reference point = object frame origin (pose_rigid.py:526-529).
        tCR = TCO_input[..., :3, 3]

        TCV_O = multiview.make_TCO_multiview(
            TCO_input,
            tCR,
            multiview_type=cfg.multiview_type,
            n_views=cfg.n_rendered_views,
            remove_TCO_rendering=cfg.remove_TCO_rendering,
            views_inplane_rotations=cfg.views_inplane_rotations,
        )
        tCV_R = TCV_O[..., :3, 3]

        images_crop, K_crop, boxes_rend, boxes_crop = self.crop_inputs(
            images, K, TCO_input, tCR, meshes
        )
        KV_crop = self.compute_crops_multiview(
            images.shape[1:3], K, TCV_O, tCV_R, meshes
        )
        if not cfg.remove_TCO_rendering:
            KV_crop = KV_crop.at[:, 0].set(K_crop)

        renders = self.render_views(meshes, TCV_O, KV_crop, tCR, ambient)
        renders = jax.lax.stop_gradient(renders)
        images_crop = self.normalize_obs(images_crop, tCR)

        x = jnp.concatenate([images_crop, renders], axis=-1)
        outputs = self.net_forward(x)
        if cfg.predict_pose_update:
            TCO_output = self.update_pose(
                TCO_input, K_crop, outputs["pose"], tCR
            )
        else:
            TCO_output = TCO_input
        return {
            "TCO_input": TCO_input,
            "TCO_output": TCO_output,
            "K_crop": K_crop,
            "tCR": tCR,
            "boxes_rend": boxes_rend,
            "boxes_crop": boxes_crop,
            "network_outputs": outputs,
            "renders": renders,
            "images_crop": images_crop,
        }

    def score_views(
        self,
        images: Array,
        K: Array,
        TCO_input: Array,
        meshes: BatchedMeshes,
        ambient: Array | None = None,
    ) -> dict[str, Array]:
        """Coarse classification forward (pose_rigid.py:634-708).

        With the coarse config (V=1) returns logits/scores `[B, 1]`.
        With the training multiview config (`sphere_26views` +
        `remove_TCO_rendering`) returns per-view logits `[B, V]`.
        """
        cfg = self.cfg
        assert cfg.predict_rendered_views_logits
        if not cfg.input_depth:
            images = images[..., :3]
        TCO_input = normalize_T(jax.lax.stop_gradient(TCO_input))
        tCR = TCO_input[..., :3, 3]

        images_crop, K_crop, boxes_rend, boxes_crop = self.crop_inputs(
            images, K, TCO_input, tCR, meshes
        )
        if cfg.n_rendered_views == 1:
            TCV_O = TCO_input[:, None]
            KV_crop = K_crop[:, None]
        else:
            TCV_O = multiview.make_TCO_multiview(
                TCO_input,
                tCR,
                multiview_type=cfg.multiview_type,
                n_views=cfg.n_rendered_views,
                remove_TCO_rendering=cfg.remove_TCO_rendering,
                views_inplane_rotations=cfg.views_inplane_rotations,
            )
            tCV_R = TCV_O[..., :3, 3]
            KV_crop = self.compute_crops_multiview(
                images.shape[1:3], K, TCV_O, tCV_R, meshes
            )
            if not cfg.remove_TCO_rendering:
                KV_crop = KV_crop.at[:, 0].set(K_crop)

        renders = self.render_views(meshes, TCV_O, KV_crop, tCR, ambient)
        renders = jax.lax.stop_gradient(renders)
        images_crop = self.normalize_obs(images_crop, tCR)
        x = jnp.concatenate([images_crop, renders], axis=-1)
        logits = self.net_forward(x)["renderings_logits"]
        return {
            "logits": logits,
            "scores": jax.nn.sigmoid(logits),
            "K_crop": K_crop,
            "tCR": tCR,
            "boxes_rend": boxes_rend,
            "boxes_crop": boxes_crop,
            "renders": renders,
            "images_crop": images_crop,
        }

    def __call__(self, images, K, TCO_input, meshes):
        """Default apply = one refine step (or coarse scoring if configured);
        used for parameter init."""
        if self.cfg.predict_rendered_views_logits:
            return self.score_views(images, K, TCO_input, meshes)
        return self.refine_step(images, K, TCO_input, meshes)
