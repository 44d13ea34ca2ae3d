"""Multi-view camera generation for render-and-compare, pure batched linalg.

The reference implements this with Panda3D scene-graph `NodePath.lookAt` math
executed per-sample on CPU (megapose6d: src/megapose/lib3d/multiview.py:31-259)
— a device round-trip per refiner iteration. Here the same view sets are
re-derived as closed-form batched linear algebra, so they trace into the jitted
refiner step.

Semantics (re-derived from `_get_views_TCO_pos_sphere`, multiview.py:31-92):
  - Work in the object frame ("world"). Camera 0 sits at `TWC0 = TCO^-1`.
  - The reference point R (typically the object-points centroid) is at
    `tWR = TWC0 . tCR`; `radius = |tCR|`.
  - A "pointing" frame is camera 0's position re-oriented to look at R, with
    up-hint = camera 0's up direction (-y column of `R_WC0`).
  - Each view offset (given in Panda3D local axes: +x right, +y forward,
    +z up) is scaled by `radius`, expressed in the pointing frame, and the
    resulting camera looks at R with the same up-hint.
  - Output is `TCV_O` — per-view camera<-object poses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._precision import einsum, matmul

from .camera import look_at_R
from .se3 import invert_se3, make_se3, rotmat_from_euler_sxyz

Array = jax.Array

# Offsets in Panda3D local axes (x right, y forward/toward-ref, z up), from
# multiview.py:95-166. Converted to CV camera axes (x right, y down, z
# forward) as (x, -z, y).
_OFFSETS_PANDA: dict[str, np.ndarray] = {
    "front_1view": np.array([[0, 0, 0]], dtype=np.float64),
    "front_3views": np.array(
        [[0, 0, 0], [1, 0, 0], [-1, 0, 0]], dtype=np.float64
    ),
    "front_5views": np.array(
        [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.float64,
    ),
    "sphere_26views": np.array(
        [
            [x, y, z]
            for y in (0, 1, 2)
            for x in (0, -1, 1)
            for z in (0, 1, -1)
            if not (x == 0 and y == 1 and z == 0)
        ],
        dtype=np.float64,
    ),
}


def _offsets_cv(name: str) -> jnp.ndarray:
    o = _OFFSETS_PANDA[name]
    return jnp.asarray(np.stack([o[:, 0], -o[:, 2], o[:, 1]], -1), jnp.float32)


def views_tco_pos_sphere(TCO: Array, tCR: Array, offsets_cv: Array) -> Array:
    """Compute `TC0_CV [B, V, 4, 4]` — per-view camera pose in camera-0 frame.

    Args:
      TCO: `[B, 4, 4]`.
      tCR: `[B, 3]` reference point in camera frame.
      offsets_cv: `[V, 3]` offsets in the pointing camera's CV axes, in units
        of `|tCR|`.
    """
    TWC0 = invert_se3(TCO)
    R0 = TWC0[..., :3, :3]
    pos0 = TWC0[..., :3, 3]
    tWR = einsum("...ij,...j->...i", R0, tCR) + pos0
    radius = jnp.linalg.norm(tCR, axis=-1, keepdims=True)
    up_hint = -R0[..., :, 1]

    Rp = look_at_R(pos0, tWR, up_hint)  # pointing frame
    # [B, V, 3] world positions.
    pos_v = pos0[..., None, :] + einsum(
        "...ij,vj->...vi", Rp, offsets_cv
    ) * radius[..., None, :]
    Rv = look_at_R(pos_v, tWR[..., None, :], up_hint[..., None, :])
    TWCv = make_se3(Rv, pos_v)
    return matmul(invert_se3(TWC0)[..., None, :, :], TWCv)


def make_TCO_multiview(
    TCO: Array,
    tCR: Array,
    multiview_type: str = "TCO+front_3views",
    n_views: int = 4,
    remove_TCO_rendering: bool = False,
    views_inplane_rotations: bool = False,
) -> Array:
    """Build the per-view object poses `TCV_O [B, V, 4, 4]`
    (multiview.py:169-259).

    `multiview_type` ∈ {"TCO+front_1view", "TCO+front_3views",
    "sphere_26views"}; view 0 is the raw TCO unless `remove_TCO_rendering`.
    If `n_views == 1` only the raw TCO view is produced.
    """
    eye = jnp.broadcast_to(jnp.eye(4, dtype=TCO.dtype), TCO.shape)
    if n_views == 1:
        TC0_CV = eye[:, None]
    else:
        name = {
            "TCO+front_1view": "front_1view",
            "TCO+front_3views": "front_3views",
            "TCO+front_5views": "front_5views",
            "sphere_26views": "sphere_26views",
        }[multiview_type]
        views = views_tco_pos_sphere(TCO, tCR, _offsets_cv(name))
        if remove_TCO_rendering:
            TC0_CV = views
        else:
            TC0_CV = jnp.concatenate([eye[:, None], views], axis=1)

    TCV_O = matmul(invert_se3(TC0_CV), TCO[:, None])

    if views_inplane_rotations:
        angles = jnp.asarray([0.0, np.pi / 2, np.pi, 3 * np.pi / 2], TCO.dtype)
        euler = jnp.stack(
            [jnp.zeros_like(angles), jnp.zeros_like(angles), angles], -1
        )
        dR = rotmat_from_euler_sxyz(euler)  # [4, 3, 3]
        R = matmul(dR[None, None], TCV_O[:, :, None, :3, :3])
        t = jnp.broadcast_to(
            TCV_O[:, :, None, :3, 3], R.shape[:-2] + (3,)
        )
        TCV_O = make_se3(R, t).reshape(
            TCV_O.shape[0], -1, 4, 4
        )
    return TCV_O
