"""Parallelism: device meshes + named shardings for DP (and optional model
sharding), replacing the reference's per-core torch-xla process spawns
(reference: train_xla.py:369-375) with a single-process SPMD program."""

from leaf_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    loader_batch_size,
    replicated_sharding,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "loader_batch_size",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
]
