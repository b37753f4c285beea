"""Mesh / sharding / multi-chip execution layer."""

from .mesh import create_mesh, shard_batch, replicate, batch_spec, replicated_spec, DATA_AXIS

__all__ = [
    "create_mesh", "shard_batch", "replicate", "batch_spec",
    "replicated_spec", "DATA_AXIS",
]
