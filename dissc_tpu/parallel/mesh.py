"""Device mesh + sharding utilities.

TPU-native replacement for the reference's distributed machinery
(``torch.distributed`` + NCCL DDP, ``sr/train.py:23-24,36-41,72-79``;
``DistributedSampler`` batch splitting ``sr/train.py:102``): a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model``
axis for tensor-sharded vocoder channels), batch arrays sharded over
``data``, params replicated.  XLA inserts the gradient ``psum`` over ICI
— the DDP-allreduce equivalent — from the sharding annotations alone.

Multi-host: call ``jax.distributed.initialize()`` once per host before
``create_mesh`` and the same code spans slices (DCN on the outer axis).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays with B sharded over ``data``.

    Single-process: a plain ``device_put`` with the batch sharding.
    Multi-process (``jax.distributed`` initialized): each host holds its
    OWN disjoint shard of the global batch (see
    ``CodeDataset.batches(process_index=...)``) and the global array is
    assembled with ``jax.make_array_from_process_local_data`` — the
    local leading dim times ``process_count`` becomes the global batch.
    """

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def mesh_for_batch(batch_size: int, n_model: int = 1,
                   devices: Optional[Sequence] = None) -> Mesh:
    """Mesh whose ``data`` axis is the largest device count dividing
    ``batch_size`` — batches always shard evenly."""
    devices = list(devices if devices is not None else jax.devices())
    avail = len(devices) // n_model
    n_data = 1
    for d in range(1, avail + 1):
        if batch_size % d == 0:
            n_data = d
    return create_mesh(n_data=n_data, n_model=n_model, devices=devices[: n_data * n_model])


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-device batch size (the reference divides the global batch by
    world size, ``sr/train.py:322``)."""
    return global_batch // mesh.shape["data"]
