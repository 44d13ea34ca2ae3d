"""Device mesh and sharding utilities (the NCCL/DDP replacement)."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch  # noqa: F401
