"""Device mesh + sharding rules.

The reference's distribution layer was one process per GPU with DDP gradient
all-reduce and a DistributedSampler (time_tuning.py:516-521, 715-717;
models.py:1292-1306; data_loader.py:1105-1107). The TPU-native equivalent is
declarative: one ``Mesh`` over all chips, batches sharded over the ``data``
axis, parameters replicated; XLA inserts the gradient psum over ICI and the
Sinkhorn uses an explicit ``lax.psum`` on the same axis (ops/sinkhorn.py).

A ``model`` axis is reserved for tensor-parallel extensions but unused by the
TimeT workload (no TP exists in the reference, SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_2d_mesh(n_outer: int, n_inner: int, axis_names: tuple[str, str],
                 devices=None) -> Mesh:
    """2-D mesh with the INNER axis over the fastest ICI links — the shared
    factory behind the (data, model) and (data, seq) meshes."""
    if devices is None:
        devices = jax.devices()
    if n_outer * n_inner > len(devices):
        raise ValueError(
            f"{axis_names[0]}*{axis_names[1]}={n_outer * n_inner} exceeds "
            f"{len(devices)} devices"
        )
    grid = np.asarray(devices[: n_outer * n_inner]).reshape(n_outer, n_inner)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data — for input batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated — for params, EMA params, prototypes, opt state."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
