"""Device mesh and sharding helpers.

The TPU-native replacement for the reference's NCCL DDP stack
(``studiosr/data/handler.py:42-57``, ``engine/trainer.py:89-91``): a 1-D
``jax.sharding.Mesh`` over all addressable devices with a ``data`` axis.
Parameters/optimizer state are replicated; batches are sharded on ``data``.
Gradient all-reduce is inserted by XLA (riding ICI within a slice) when the
jitted loss reduces over the sharded batch axis — no explicit collectives in
user code.

An optional ``tile`` axis supports spatially-sharded (sequence-parallel
analog) inference for very large images — see parallel/tiled.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "get_mesh",
    "get_multislice_mesh",
    "data_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate",
    "P",
]


def get_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """Mesh over all (or the given) devices.

    Topology-aware: when the devices span multiple TPU slices (multi-slice
    pods expose ``device.slice_index``), the mesh is 2-D ``("dcn", "data")``
    — slice-crossing collectives ride the slower DCN axis explicitly, and
    intra-slice gradient reduce-scatters stay on ICI (XLA lowers the
    batch-axis psum hierarchically over the two axes). Single-slice (and CPU
    test meshes): the familiar 1-D ``(axis_name,)`` mesh.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if axis_name == "data":
        slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devices})
        if len(slice_ids) > 1:
            return get_multislice_mesh(len(slice_ids), devices)
    return Mesh(np.array(devices), (axis_name,))


def get_multislice_mesh(num_slices: int, devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``("dcn", "data")`` mesh: rows are slices, columns intra-slice
    devices. Devices are grouped by ``slice_index`` when present (real
    multi-slice hardware), else split contiguously (virtual test meshes)."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % num_slices:
        raise ValueError(f"{len(devices)} devices do not divide into {num_slices} slices")
    per = len(devices) // num_slices
    if any(getattr(d, "slice_index", None) is not None for d in devices):
        devices = sorted(devices, key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    grid = np.array(devices).reshape(num_slices, per)
    return Mesh(grid, ("dcn", "data"))


def data_sharding(mesh: Mesh, ndim: int = 4, axis_name=None, axis: int = 0) -> NamedSharding:
    """Shard the batch axis (``axis``, default leading) over the mesh; rest
    replicated — ``axis=1`` for step-stacked batches (k, B, ...).

    ``axis_name=None`` (default) shards over ALL mesh axes — ``("data",)``
    on the 1-D mesh, ``("dcn", "data")`` on a multi-slice mesh — so callers
    are mesh-shape agnostic."""
    spec = [None] * ndim
    spec[axis] = tuple(mesh.axis_names) if axis_name is None else axis_name
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name=None, axis: int = 0):
    """Shard a host batch's leading axis over the mesh.

    Single-process: ``device_put`` with a batch-axis NamedSharding. Multi-host
    (``jax.process_count() > 1``): each host holds only its local slice of the
    global batch, so the global array must be assembled from per-process
    shards via ``jax.make_array_from_process_local_data`` — ``device_put``
    would misread the local slice as the full global array.
    """
    multihost = jax.process_count() > 1

    def put(x):
        sharding = data_sharding(mesh, np.ndim(x), axis_name, axis=axis)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
