"""Cluster smoke test: device/process visibility + one collective.

Re-design of the reference's `scripts/test_distributed.py:38-51` (print
rank/world/GPU + barrier) for JAX: initialize multi-process if configured,
print the topology, and run one psum across all devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.distributed import init_distributed_mode
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    rank, world = init_distributed_mode()
    logger.info(
        f"process {rank}/{world}; local devices: {jax.local_devices()}; "
        f"global devices: {len(jax.devices())}"
    )
    n = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    x = jax.device_put(
        jnp.arange(n, dtype=jnp.float32), NamedSharding(mesh, P("dp"))
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(x)
    expected = n * (n - 1) / 2
    assert float(total) == expected, (float(total), expected)
    logger.info(f"collective sum over {n} devices OK ({float(total)})")


if __name__ == "__main__":
    main()
