"""Core jit-friendly math ops (SE(3), camera, crops, losses, rendering)."""

from . import (  # noqa: F401
    camera,
    cropping,
    losses,
    mesh_ops,
    multiview,
    pose_init,
    se3,
    so3_grid,
    symmetries,
)
