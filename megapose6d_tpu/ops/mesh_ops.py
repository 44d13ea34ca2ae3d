"""Mesh point-set ops (AABB corners, subsampling), pure JAX.

TPU-native re-design of the reference's `lib3d/mesh_ops.py`
(megapose6d: src/megapose/lib3d/mesh_ops.py:34-87).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# The 8 corner sign patterns of an axis-aligned box. numpy, not jnp: a
# module-scope device array would initialize the XLA backend at import
# time (breaking jax.distributed.initialize ordering).
_CORNER_SIGNS = np.asarray(
    [
        [sx, sy, sz]
        for sx in (-1.0, 1.0)
        for sy in (-1.0, 1.0)
        for sz in (-1.0, 1.0)
    ],
    np.float32,
)


def masked_bounds(points: Array, valid: Array | None = None) -> tuple[Array, Array]:
    """(min, max) `[B, 3]` over the point axis, honoring a padding mask."""
    if valid is None:
        return jnp.min(points, axis=-2), jnp.max(points, axis=-2)
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    v = valid[..., None]
    lo = jnp.min(jnp.where(v, points, big), axis=-2)
    hi = jnp.max(jnp.where(v, points, -big), axis=-2)
    return lo, hi


def get_meshes_center(points: Array, valid: Array | None = None) -> Array:
    """AABB center `[B, 3]` (mesh_ops.py:56-63 `get_meshes_center`)."""
    lo, hi = masked_bounds(points, valid)
    return (lo + hi) / 2


def get_meshes_bounding_boxes(points: Array, valid: Array | None = None) -> Array:
    """8 AABB corner points `[B, 8, 3]` (mesh_ops.py:34-53)."""
    lo, hi = masked_bounds(points, valid)
    center = (lo + hi) / 2
    half = (hi - lo) / 2
    return center[..., None, :] + _CORNER_SIGNS * half[..., None, :]


def sample_points(
    key: Array, points: Array, n_points: int, deterministic: bool = False
) -> Array:
    """Subsample `n_points` per batch element (mesh_ops.py:77-87).

    Deterministic mode takes an evenly-strided subset; random mode samples
    without replacement via random keys + top-k (jit-friendly).
    """
    B, N, _ = points.shape
    if deterministic:
        idx = jnp.linspace(0, N - 1, n_points).astype(jnp.int32)
        idx = jnp.broadcast_to(idx, (B, n_points))
    else:
        scores = jax.random.uniform(key, (B, N))
        _, idx = jax.lax.top_k(scores, n_points)
    return jnp.take_along_axis(points, idx[..., None], axis=-2)
