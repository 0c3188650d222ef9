"""Device-mesh helpers: the TPU-native replacement for the reference's
NCCL/DDP layer (reference models/encodec/distributed/, quantization/distrib.py).

One ``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded on it,
parameters replicated. Gradient all-reduce, codebook-stat reduction and
broadcast-from-0 semantics all come out of GSPMD automatically — no
hand-written transport. Multi-host launch = ``jax.distributed.initialize``
before calling :func:`make_mesh` (it sees all global devices).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host pytree with its leading dim sharded over the mesh.

    Single-host: a plain sharded device_put. Multi-host: ``batch`` is this
    process's LOCAL shard (each host loads its own slice of the global
    batch, like the reference's DistributedSampler) and the global array is
    assembled with ``make_array_from_process_local_data``.
    """
    if jax.process_count() > 1:

        def put(x):
            sharding = data_sharding(mesh, np.ndim(x), axis)
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))

        return jax.tree_util.tree_map(put, batch)

    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x), axis))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
