"""Mesh construction + sharding helpers for data-parallel training.

The model family is ≤ ~100M params (SURVEY.md §2.8): data parallelism over
the `data` mesh axis is the production strategy — parameters replicated,
activations sharded on batch. TP/PP are intentionally absent (as in the
reference); spatial (H/W) sharding is the long-context analog and can be
added as an extra mesh axis without touching the step function.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh then spans all processes and `psum` gradients ride ICI/DCN
automatically (replaces the reference's Accelerate/NCCL stack,
`/root/reference/src/train.py:26-47`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def initialize_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Multi-host init + global data mesh: the single call replacing the
    reference's `accelerate launch` + DDP process-group setup
    (`/root/reference/src/train.py:26-47`, `README.md:76`).

    On managed TPU pods all args are auto-detected from the environment;
    pass them explicitly for manual clusters. Every process must call this
    before building the train step; the returned mesh spans ALL hosts'
    devices, so `psum` gradients ride ICI within a slice and DCN across
    slices with no further code changes.
    """
    # NOTE: must not touch jax.process_count()/jax.devices() before
    # jax.distributed.initialize() — they initialise the XLA backend, after
    # which distributed init is rejected (caught by
    # tests/test_multihost_init.py; the original guard did exactly that).
    if not jax.distributed.is_initialized():
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            try:
                jax.distributed.initialize()  # env auto-detection (TPU pods)
            except Exception:
                pass  # single-host fallback: local devices only
    return make_mesh()


def process_local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this host should feed: hosts load
    disjoint shards (the reference's DistributedSampler equivalent)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Batch-dim sharding (leading axis split across the mesh)."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(
    batch: Any, mesh: Mesh, axis: str = DATA_AXIS, leading_stack: bool = False
) -> Any:
    """Device-put a host batch pytree with the batch dim sharded.

    `leading_stack=True`: leaves carry a leading scan/step dim (see
    `training.step.make_multi_step`) — the SECOND dim is the sharded batch.
    """
    if leading_stack:
        sh = NamedSharding(mesh, P(None, axis))
    else:
        sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
