"""Device mesh + sharding helpers.

The TPU analog of the reference's DDP/NCCL layer (megapose6d:
src/megapose/utils/distributed.py:137-154): data parallelism is a GSPMD
sharding of the batch axis over a `jax.sharding.Mesh`, gradients are reduced
by XLA collectives over ICI — no process groups, no file-based side channels
for tensors.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available on backend "
                f"'{jax.default_backend()}'. For virtual devices set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "JAX_PLATFORMS=cpu before first backend use."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Device_put a pytree of arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
