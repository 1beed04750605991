"""Device mesh + sharding utilities.

The reference's only parallelism is data-parallel torch-xla: one process per
TPU core, DistributedSampler data sharding, gradient all-reduce inside
``xm.optimizer_step`` (reference: train_xla.py:128-129,192-196,283). Here the
equivalent is a single SPMD program: a ``jax.sharding.Mesh`` with a ``data``
axis (and an optional ``model`` axis for tensor-parallel experiments), batch
arrays sharded over ``data``, params replicated (or sharded over ``model``),
and XLA inserting the gradient all-reduce automatically when the jitted train
step's output shardings demand it. Collectives ride ICI; multi-host needs
only ``jax.distributed.initialize`` upstream.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "stacked_batch_sharding",
           "replicated_sharding", "shard_batch", "shard_params",
           "local_batch_slice", "loader_batch_size"]


def loader_batch_size(cfg_batch_size: int, n_devices: int,
                      process_count: int = 1,
                      mode: str = "per_device") -> int:
    """Per-PROCESS loader batch size under the chosen batch semantics.

    mode='per_device' (default — reference parity): cfg ``opt.batch_size``
    counts clips PER CHIP, exactly like the reference, where each of N
    xmp-spawned processes runs its own ``DataLoader(batch_size)`` over a
    DistributedSampler shard (reference train_xla.py:176,192-194) — the
    flagship recipe at 8 cores consumes 256×8 clips per optimizer step.
    mode='global': cfg batch_size is the GLOBAL batch, sharded over the
    mesh (same clips/step at any device count — useful for exact-repro
    scaling studies). On one device the modes coincide.
    """
    if mode == "per_device":
        global_batch = cfg_batch_size * n_devices
    elif mode == "global":
        global_batch = cfg_batch_size
    else:
        raise ValueError(f"unknown batch_mode {mode!r} "
                         "(expected 'per_device' or 'global')")
    if global_batch % max(1, process_count):
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{process_count} processes")
    if global_batch % max(1, n_devices):
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{n_devices} devices")
    return global_batch // max(1, process_count)


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D ('data',) or 2-D ('data','model') mesh over the first
    ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}")
    if model_parallel > 1:
        arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; trailing axes replicated."""
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a K-stacked batch (K, B, ...): the scan/steps axis K is
    replicated, the batch axis B is sharded over 'data' — the layout
    ``make_train_multistep`` consumes (each of the K inner steps runs the
    ordinary data-parallel step over axis B)."""
    return NamedSharding(mesh, P(None, "data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, stacked: bool = False):
    """Place every array in a batch PyTree with its leading axis sharded
    over the 'data' mesh axis (``stacked=True``: leading axis is a K-steps
    stack, the SECOND axis is the batch — see ``stacked_batch_sharding``).

    Single-process: a plain device_put. Multi-host: each process holds its
    LOCAL manifest shard (see ShardedSampler), so the global array is
    assembled with ``make_array_from_process_local_data`` — the JAX
    equivalent of the reference's per-ordinal DistributedSampler feed."""
    sharding = stacked_batch_sharding(mesh) if stacked else batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_params(mesh: Mesh, params):
    """Replicate a parameter PyTree across the mesh.

    The LEAF + CNN models are far below per-chip HBM, so full replication
    (pure DP) is the performance-optimal layout: zero parameter collectives
    in the forward pass, one psum of grads per step.
    """
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), params)


def local_batch_slice(global_batch_size: int,
                      process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """Manifest shard for this host — the multi-host analogue of the
    reference's DistributedSampler(rank) (training_utils.py:13-19)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per = global_batch_size // process_count
    return slice(process_index * per, (process_index + 1) * per)
