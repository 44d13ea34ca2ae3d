"""Object symmetry sets (BOP convention).

TPU-native re-design of the reference's `lib3d/symmetries.py`
(megapose6d: src/megapose/lib3d/symmetries.py:33-88). Host-side numpy (runs at
mesh-preprocessing time); the resulting `[S, 4, 4]` arrays are padded and
stacked into the device mesh database.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ContinuousSymmetry:
    """Rotational symmetry about `axis` through `offset` (must be 0 here)."""

    offset: np.ndarray = field(default_factory=lambda: np.zeros(3))
    axis: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 1.0]))


@dataclass
class DiscreteSymmetry:
    """A single symmetry pose, `(4, 4)` homogeneous matrix."""

    pose: np.ndarray = field(default_factory=lambda: np.eye(4))


def _euler_sxyz_mat(euler: np.ndarray) -> np.ndarray:
    ax, ay, az = euler
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def make_symmetries_poses(
    symmetries_discrete: list[DiscreteSymmetry] = [],
    symmetries_continuous: list[ContinuousSymmetry] = [],
    n_symmetries_continuous: int = 8,
    units: str = "mm",
    scale: float | None = None,
) -> np.ndarray:
    """All symmetry transforms: {I, discrete} x {continuous samples}
    (symmetries.py:52-88). Identity is always first.

    Returns `[S, 4, 4]` float64.
    """
    if scale is None:
        scale = {"m": 1.0, "mm": 0.001}[units]
    all_discrete = [np.eye(4)]
    for sym_d in symmetries_discrete:
        M = np.array(sym_d.pose, dtype=np.float64).copy()
        M[:3, -1] *= scale
        all_discrete.append(M)
    all_continuous = []
    for sym_c in symmetries_continuous:
        assert np.allclose(sym_c.offset, 0), "offset symmetries unsupported"
        axis = np.asarray(sym_c.axis, dtype=np.float64)
        assert axis.sum() == 1
        for n in range(n_symmetries_continuous):
            euler = axis * 2 * np.pi * n / n_symmetries_continuous
            M = np.eye(4)
            M[:3, :3] = _euler_sxyz_mat(euler)
            all_continuous.append(M)
    out = []
    for Md in all_discrete:
        if all_continuous:
            for Mc in all_continuous:
                out.append(Mc @ Md)
        else:
            out.append(Md)
    return np.stack(out, axis=0)


def pad_symmetries(syms: np.ndarray, n_max: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad `[S, 4, 4]` to `[n_max, 4, 4]` with identities + validity mask.

    Analog of the fixed-size symmetry stacking in
    rigid_mesh_database.py:133-155 (which repeats identity for padding).
    """
    if len(syms) > n_max:
        import warnings

        warnings.warn(
            f"pad_symmetries: truncating {len(syms)} symmetry poses to "
            f"n_max={n_max}; symmetric losses/metrics will under-sweep. "
            "Raise n_sym at MeshDataBase construction.",
            stacklevel=2,
        )
    s = min(len(syms), n_max)
    out = np.tile(np.eye(4), (n_max, 1, 1))
    out[:s] = syms[:s]
    valid = np.zeros(n_max, dtype=bool)
    valid[:s] = True
    return out, valid
