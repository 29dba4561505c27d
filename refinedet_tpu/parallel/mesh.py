"""Device mesh + sharding layout for data-parallel training.

TPU-native counterpart of the reference's only distribution strategy —
single-process ``nn.DataParallel`` over 4 GPUs
(``/root/reference/train_refinedet.py:138-139``, SURVEY.md §2.3). Instead of
replicate/scatter/gather over PCIe, we lay a 1-D ``jax.sharding.Mesh`` over
all local devices, shard the batch dimension (`P('data')`), replicate
parameters, and let XLA SPMD insert the gradient all-reduce over ICI.
Multi-host extension: ``jax.distributed.initialize`` + the same mesh over
``jax.devices()`` — the sharding code below is unchanged.

The mesh is 1-D because RefineDet (~34M params) needs no tensor/pipeline
parallelism (SURVEY.md §2.3); an optional ``model`` axis is still accepted
for forward-compatible layouts (e.g. spatial sharding at very large inputs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (or reshaped) mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        # Put everything on the leading axis by default; callers wanting a
        # 2-D layout can reshape the returned mesh themselves.
        arr = arr.reshape((len(devices),) + (1,) * (len(axis_names) - 1))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch pytree with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
