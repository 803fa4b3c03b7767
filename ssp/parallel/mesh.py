"""Mesh construction + sharding helpers.

The reference has no distributed backend at all (SURVEY.md §2.7): its
only parallelism is single-process ``nn.DataParallel`` during export and
gradient accumulation during training.  The TPU-native replacement is a
1-D data mesh: batches are sharded over the ``data`` axis, parameters
are replicated, and pjit inserts the gradient all-reduce over ICI.  The
same mesh shards the homography-adaptation warp stack at export time.

Multi-host pods: call ``jax.distributed.initialize()`` before
``make_mesh`` and the same code spans hosts over DCN (data-parallel
only, matching the reference's semantics).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Sharding with dimension ``axis`` split over the data axis
    (axis 0 = the usual [B, ...] batch; axis 1 = [steps, B, ...]
    stacked multi-step batches)."""
    return NamedSharding(mesh, P(*([None] * axis), DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: int = 0) -> Any:
    """device_put a pytree with dimension ``axis`` sharded over the mesh.

    A leaf whose ``axis`` dimension is not divisible by the mesh size is
    replicated instead (e.g. a validation batch smaller than the
    data-parallel degree picked for the training batch): results are
    identical, each device just computes the full batch redundantly."""
    n = int(np.prod(mesh.devices.shape))
    sharded = batch_sharding(mesh, axis)
    replicated = replicate_sharding(mesh)

    def put(x):
        divisible = np.ndim(x) > axis and x.shape[axis] % n == 0
        return jax.device_put(x, sharded if divisible else replicated)

    return jax.tree_util.tree_map(put, batch)
