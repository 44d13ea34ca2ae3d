"""SE(3) / SO(3) primitives, pure JAX.

TPU-native re-design of the reference's `lib3d/transform_ops.py` and
`lib3d/rotations.py` (megapose6d: src/megapose/lib3d/transform_ops.py:31-130,
src/megapose/lib3d/rotations.py:25-40). The reference wraps pinocchio (C++) for
its `Transform` type; here everything is plain `jnp` on homogeneous `[..., 4, 4]`
matrices so the whole pose pipeline stays inside one XLA program.

Conventions:
  - Homogeneous transforms `T` are `[..., 4, 4]`, row-major, acting on column
    vectors: `x_out = R @ x + t`.
  - Quaternions are `[..., 4]` in **xyzw** order (matching the reference, which
    uses pinocchio/roma xyzw).
  - All functions are jit-friendly: static shapes, no Python branching on values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ._precision import einsum, matmul

Array = jax.Array


def transform_pts(T: Array, pts: Array) -> Array:
    """Apply homogeneous transform(s) to 3D points.

    Args:
      T: `[..., 4, 4]` or `[..., S, 4, 4]` (a set of S transforms per batch
        element, e.g. a symmetry set).
      pts: `[..., N, 3]`.

    Returns:
      `[..., N, 3]` or `[..., S, N, 3]` matching the reference semantics of
      `transform_pts` (transform_ops.py:31-57).
    """
    if T.ndim == pts.ndim + 1:
        # [..., S, 4, 4] x [..., N, 3] -> [..., S, N, 3]
        pts = pts[..., None, :, :]
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def invert_se3(T: Array) -> Array:
    """Closed-form inverse of an SE(3) matrix batch (transform_ops.py:60-68)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = -matmul(R_inv, t)
    return make_se3(R_inv, t_inv[..., 0])


def make_se3(R: Array, t: Array) -> Array:
    """Assemble `[..., 4, 4]` from `R [..., 3, 3]` and `t [..., 3]`."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def rotmat_from_ortho6d(poses: Array) -> Array:
    """Continuous 6D rotation parameterization -> rotation matrix.

    Zhou et al., CVPR'19 ("On the Continuity of Rotation Representations"),
    matching `compute_rotation_matrix_from_ortho6d` (rotations.py:25-40): the
    first 3 numbers are the (unnormalized) x column, the second 3 seed y; the
    matrix columns are (x, y, z).

    Args:
      poses: `[..., 6]`.
    Returns:
      `[..., 3, 3]`.
    """
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    eps = jnp.asarray(1e-12, poses.dtype)
    x = x_raw / jnp.maximum(jnp.linalg.norm(x_raw, axis=-1, keepdims=True), eps)
    z = jnp.cross(x, y_raw)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def se3_from_pose9d(pose9d: Array) -> Array:
    """9D pose (ortho6d rotation + translation) -> `[..., 4, 4]`.

    Matches `compute_transform_from_pose9d` (transform_ops.py:105-113).
    """
    R = rotmat_from_ortho6d(pose9d[..., :6])
    return make_se3(R, pose9d[..., 6:9])


def normalize_T(T: Array) -> Array:
    """Re-orthonormalize the rotation block via the ortho6d round-trip.

    The reference runs this each refiner iteration to stop error accumulation
    (transform_ops.py:117-119, pose_rigid.py:525).
    """
    pose9d = jnp.concatenate(
        [T[..., :3, 0], T[..., :3, 1], T[..., :3, 3]], axis=-1
    )
    return se3_from_pose9d(pose9d)


def rotmat_from_quat(q: Array) -> Array:
    """Unit quaternion (xyzw) -> rotation matrix. `q: [..., 4]`."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_rotmat(R: Array) -> Array:
    """Rotation matrix -> unit quaternion (xyzw), branch-free (Shepperd).

    Computes all four candidate quaternions and selects the numerically best
    one with `where` masks, so it is safe under `vmap`/`jit`.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, scaled by 4*q_k^2 >= 0.
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # candidate from w
    w_w = jnp.sqrt(qw2) / 2
    q_w = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4 * w_w**2], -1)
    # candidate from x
    w_x = jnp.sqrt(qx2) / 2
    q_x = jnp.stack([4 * w_x**2, (m01 + m10), (m02 + m20), (m21 - m12)], -1)
    # candidate from y
    w_y = jnp.sqrt(qy2) / 2
    q_y = jnp.stack([(m01 + m10), 4 * w_y**2, (m12 + m21), (m02 - m20)], -1)
    # candidate from z
    w_z = jnp.sqrt(qz2) / 2
    q_z = jnp.stack([(m02 + m20), (m12 + m21), 4 * w_z**2, (m10 - m01)], -1)

    vals = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(vals, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def random_rotations(key: Array, shape: tuple[int, ...]) -> Array:
    """Haar-uniform random rotation matrices `shape + (3, 3)`.

    Normalized Gaussian 4-vectors are uniform on S^3, hence uniform on
    SO(3) through the double cover (same construction as pytorch3d's
    `random_rotations`, used by the reference's eval jitter).
    """
    q = jax.random.normal(key, tuple(shape) + (4,))
    return rotmat_from_quat(q)


def small_random_rotations(
    key: Array, shape: tuple[int, ...], max_angle_rad: float
) -> Array:
    """Random rotations with angle ~ U[0, max_angle_rad] about a
    Haar-uniform axis; `shape + (3, 3)`."""
    k_axis, k_ang = jax.random.split(key)
    axis = jax.random.normal(k_axis, tuple(shape) + (3,))
    axis = axis / (
        jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12
    )
    half = jax.random.uniform(k_ang, tuple(shape)) * (max_angle_rad / 2.0)
    q = jnp.concatenate(
        [axis * jnp.sin(half)[..., None], jnp.cos(half)[..., None]], -1
    )  # xyzw
    return rotmat_from_quat(q)


def rotmat_from_euler_sxyz(euler: Array) -> Array:
    """Static-frame XYZ euler angles -> rotation matrix (R = Rz @ Ry @ Rx).

    Matches transforms3d `euler2mat(..., axes='sxyz')` used by the reference
    for pose noise (transform_ops.py:71-102) and in-plane view rotations
    (multiview.py:241-247).
    """
    ax, ay, az = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    Rx = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], -1
    ).reshape(euler.shape[:-1] + (3, 3))
    Ry = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], -1
    ).reshape(euler.shape[:-1] + (3, 3))
    Rz = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], -1
    ).reshape(euler.shape[:-1] + (3, 3))
    return matmul(Rz, matmul(Ry, Rx))


def add_pose_noise(
    key: Array,
    TCO: Array,
    euler_deg_std: tuple[float, float, float] = (15.0, 15.0, 15.0),
    trans_std: tuple[float, float, float] = (0.01, 0.01, 0.05),
) -> Array:
    """Right-multiply rotation noise and add translation noise.

    JAX-PRNG analog of `add_noise` (transform_ops.py:71-102):
    `R_out = R @ R_noise(euler ~ N(0, std_deg))`, `t_out = t + N(0, trans_std)`.

    Args:
      key: PRNG key.
      TCO: `[B, 4, 4]`.
    """
    kr, kt = jax.random.split(key)
    bsz = TCO.shape[0]
    euler_std = jnp.asarray(euler_deg_std, TCO.dtype) * (jnp.pi / 180.0)
    euler = jax.random.normal(kr, (bsz, 3), TCO.dtype) * euler_std
    R_noise = rotmat_from_euler_sxyz(euler)
    t_noise = jax.random.normal(kt, (bsz, 3), TCO.dtype) * jnp.asarray(
        trans_std, TCO.dtype
    )
    R = matmul(TCO[..., :3, :3], R_noise)
    t = TCO[..., :3, 3] + t_noise
    return make_se3(R, t)


def geodesic_distance(R1: Array, R2: Array) -> Array:
    """Angular distance (radians) between rotation matrices.

    Matches `compute_geodesic_distance` semantics in the reference's
    utils/transform_utils.py:53-78 (acos of (trace-1)/2, clipped).
    """
    m = matmul(R1, jnp.swapaxes(R2, -2, -1))
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)
