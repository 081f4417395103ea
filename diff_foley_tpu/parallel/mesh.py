"""Device-mesh construction and sharding helpers.

The reference's only parallelism is NCCL DDP (SURVEY.md §2.8); here that maps
to a `data` mesh axis: batches are sharded over it, parameters replicated,
and gradient psums are inserted by XLA under jit. A second `model` axis is
reserved for tensor-parallel experiments (not needed for parity, but the mesh
plumbing supports it so larger UNets can shard attention heads / FFN width).

Multi-host: call `jax.distributed.initialize()` before building the mesh —
the axes here are process-agnostic (jax global devices).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Shard the leading (batch) axis of every leaf over the data axis.

    Each leaf is this process's LOCAL batch. Single-process: device_put with
    the global sharding. Multi-host: device_put would misread the local
    array as the global value, so build the global array from per-process
    shards instead (each host contributes its slice of the global batch)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
