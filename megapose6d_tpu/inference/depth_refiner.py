"""Depth-based pose refinement (the RGBD pipeline's final stage).

Re-design of the reference's `DepthRefiner` ABC + `ICPRefiner`
(megapose6d: src/megapose/inference/depth_refiner.py:29-52,
inference/icp_refiner.py:183-262). The refiner renders the predicted pose's
depth with the on-device rasterizer and runs the jitted JAX ICP
(`ops/icp.py`) — no OpenCV, no per-object CPU loop.
"""

from __future__ import annotations

import abc
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tensor_collection import PandasTensorCollection
from ..meshes.mesh_db import BatchedMeshes
from ..ops import icp, rasterizer_tiled, registration


def compute_masks(
    mask_type: str,
    depth_rendered,
    depth_measured,
    depth_delta_thresh: float = 0.1,
):
    """Object masks for depth refinement
    (inference/refiner_utils.py:compute_masks): 'simple' = rendered
    footprint; 'threshold' also rejects pixels whose measured depth
    deviates from the render by more than `depth_delta_thresh`."""
    import jax.numpy as jnp

    rendered_ok = depth_rendered > 0
    if mask_type == "simple":
        return rendered_ok
    if mask_type == "threshold":
        delta = jnp.abs(depth_measured - depth_rendered)
        return rendered_ok & (depth_measured > 0) & (
            delta < depth_delta_thresh
        )
    raise ValueError(mask_type)


class DepthRefiner(abc.ABC):
    """Interface parity with inference/depth_refiner.py:29-52."""

    @abc.abstractmethod
    def refine_poses(
        self,
        predictions: PandasTensorCollection,
        masks=None,
        depth=None,
        K=None,
    ) -> tuple[PandasTensorCollection, dict]:
        ...


class ICPRefiner(DepthRefiner):
    def __init__(
        self,
        mesh_db: BatchedMeshes,
        n_points: int = 1024,
        n_iterations: int = 30,
        resolution_downscale: int = 2,
    ):
        self.mesh_db = mesh_db
        self.n_points = n_points
        self.n_iterations = n_iterations
        self.downscale = resolution_downscale

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _refine_batch(self, key, TCO, mesh_idx, depth, resolution, K):
        """depth: [H, W]; TCO: [N, 4, 4]; returns (TCO_refined, residual,
        valid)."""
        meshes = self.mesh_db.select(mesh_idx)
        N = TCO.shape[0]
        K_b = jnp.broadcast_to(K, (N, 3, 3))
        rendered = rasterizer_tiled.render_meshes_tiled(
            meshes.vertices, meshes.normals, meshes.colors, meshes.faces,
            meshes.face_valid, TCO, K_b, resolution,
            interpret=jax.default_backend() == "cpu",
        )

        def one(k, TCO_n, depth_r):
            res = icp.icp_refine_pose(
                k, TCO_n, depth, depth_r, K,
                n_points=self.n_points,
                n_iterations=self.n_iterations,
            )
            TCO_refined = res.T_delta @ TCO_n
            # Reference ICP keeps the RGB pose whenever ICP fails
            # (icp_refiner.py retval != 0); a non-finite transform is a
            # failure regardless of what the solver's own flag says.
            ok = res.valid & jnp.isfinite(TCO_refined).all()
            return (
                jnp.where(ok, TCO_refined, TCO_n),
                res.residual,
                ok,
            )

        keys = jax.random.split(key, N)
        return jax.vmap(one)(keys, TCO, rendered.depth)

    def refine_poses(
        self,
        predictions: PandasTensorCollection,
        masks=None,
        depth=None,
        K=None,
    ) -> tuple[PandasTensorCollection, dict]:
        """predictions.poses [N, 4, 4]; depth [H, W] or [1, H, W];
        K [3, 3] or [1, 3, 3]."""
        assert depth is not None and K is not None
        depth = np.asarray(depth)
        if depth.ndim == 3:
            depth = depth[0]
        K = np.asarray(K, np.float32)
        if K.ndim == 3:
            K = K[0]
        labels = list(predictions.infos["label"])
        mesh_idx = self.mesh_db.label_to_index(labels)

        ds = self.downscale
        if ds > 1:
            depth_r = depth[::ds, ::ds]
            K_r = K.copy()
            K_r[:2] /= ds
        else:
            depth_r, K_r = depth, K
        resolution = depth_r.shape

        TCO_refined, residual, valid = self._refine_batch(
            jax.random.PRNGKey(0),
            jnp.asarray(predictions.poses, jnp.float32),
            mesh_idx,
            jnp.asarray(depth_r, jnp.float32),
            tuple(resolution),
            jnp.asarray(K_r),
        )
        out = PandasTensorCollection(
            predictions.infos.copy(), poses=np.asarray(TCO_refined)
        )
        extra = {
            "residual": np.asarray(residual),
            "valid": np.asarray(valid),
        }
        return out, extra


class GNCRegistrationRefiner(DepthRefiner):
    """Global-registration depth refiner — the reference's TeaserppRefiner
    analog (inference/teaserpp_refiner.py:53-289).

    Like the reference, builds PIXEL-WISE PAIRED clouds (rendered depth
    of the predicted pose vs measured depth over the same mask) and runs
    robust registration on them; TEASER++'s C++ solver is replaced by the
    jitted GNC-TLS estimator (`ops/registration.py`), and pytorch3d's
    CUDA farthest-point sampling by random masked sampling (the reference
    exposes the same fallback, use_farthest_point_sampling=False).
    """

    def __init__(
        self,
        mesh_db: BatchedMeshes,
        n_points: int = 512,
        n_iterations: int = 20,
        noise_bound: float = 0.01,
        resolution_downscale: int = 2,
    ):
        self.mesh_db = mesh_db
        self.n_points = n_points
        self.n_iterations = n_iterations
        self.noise_bound = noise_bound
        self.downscale = resolution_downscale

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _refine_batch(self, key, TCO, mesh_idx, depth, resolution, K):
        meshes = self.mesh_db.select(mesh_idx)
        N = TCO.shape[0]
        K_b = jnp.broadcast_to(K, (N, 3, 3))
        rendered = rasterizer_tiled.render_meshes_tiled(
            meshes.vertices, meshes.normals, meshes.colors, meshes.faces,
            meshes.face_valid, TCO, K_b, resolution,
            interpret=jax.default_backend() == "cpu",
        )
        xyz_tgt = icp.depth_to_xyz(depth, K)  # measured

        def one(k, TCO_n, depth_r):
            xyz_src = icp.depth_to_xyz(depth_r, K)
            mask = (depth_r > 0) & (depth > 0)
            idx, valid = icp._masked_sample_idx(k, mask, self.n_points)
            flat_src = xyz_src.reshape(-1, 3)
            flat_tgt = xyz_tgt.reshape(-1, 3)
            src = flat_src[idx]
            tgt = flat_tgt[idx]
            res = registration.gnc_tls_registration(
                src, tgt, valid,
                noise_bound=self.noise_bound,
                n_iterations=self.n_iterations,
            )
            TCO_refined = res.T_tgt_src @ TCO_n
            ok = res.valid & jnp.isfinite(TCO_refined).all()
            return (
                jnp.where(ok, TCO_refined, TCO_n),
                res.n_inliers,
                ok,
            )

        keys = jax.random.split(key, N)
        return jax.vmap(one)(keys, TCO, rendered.depth)

    def refine_poses(
        self,
        predictions: PandasTensorCollection,
        masks=None,
        depth=None,
        K=None,
    ) -> tuple[PandasTensorCollection, dict]:
        assert depth is not None and K is not None
        depth = np.asarray(depth)
        if depth.ndim == 3:
            depth = depth[0]
        K = np.asarray(K, np.float32)
        if K.ndim == 3:
            K = K[0]
        labels = list(predictions.infos["label"])
        mesh_idx = self.mesh_db.label_to_index(labels)

        ds = self.downscale
        if ds > 1:
            depth_r = depth[::ds, ::ds]
            K_r = K.copy()
            K_r[:2] /= ds
        else:
            depth_r, K_r = depth, K
        resolution = depth_r.shape

        TCO_refined, n_inliers, valid = self._refine_batch(
            jax.random.PRNGKey(0),
            jnp.asarray(predictions.poses, jnp.float32),
            mesh_idx,
            jnp.asarray(depth_r, jnp.float32),
            tuple(resolution),
            jnp.asarray(K_r),
        )
        out = PandasTensorCollection(
            predictions.infos.copy(), poses=np.asarray(TCO_refined)
        )
        extra = {
            "n_inliers": np.asarray(n_inliers),
            "valid": np.asarray(valid),
        }
        return out, extra
