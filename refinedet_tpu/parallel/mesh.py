"""Device mesh + sharding layout for data-parallel training.

TPU-native counterpart of the reference's only distribution strategy —
single-process ``nn.DataParallel`` over 4 GPUs
(``/root/reference/train_refinedet.py:138-139``, SURVEY.md §2.3). Instead of
replicate/scatter/gather over PCIe, we lay a 1-D ``jax.sharding.Mesh`` over
all local devices, shard the batch dimension (`P('data')`), replicate
parameters, and let XLA SPMD insert the gradient all-reduce over ICI.
Multi-host extension: ``jax.distributed.initialize`` + the same mesh over
``jax.devices()`` — the sharding code below is unchanged.

The default mesh is 1-D because RefineDet (~34M params) needs no tensor/
pipeline parallelism (SURVEY.md §2.3). The analogous scaling axis for a
fixed-resolution CNN is *spatial* (SURVEY.md §5.7): a second ``space``
mesh axis shards the image height dimension across devices and XLA SPMD
inserts the conv halo exchanges — the detector's counterpart of sequence
parallelism, useful when per-device batch would otherwise drop below 1
(very large inputs such as the 896 five-source variant).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Mesh over the first ``num_devices`` devices.

    ``shape`` lays the devices out over ``axis_names`` (e.g.
    ``shape=(4, 2), axis_names=("data", "space")`` = 4-way batch x 2-way
    spatial). Default: everything on the leading axis.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P("data"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image sharding: batch over 'data', height over 'space' (if the
    mesh has a non-trivial spatial axis). Convolutions over the sharded
    height dim compile to windowed halo exchanges inserted by XLA SPMD."""
    if "space" in mesh.axis_names and mesh.shape["space"] > 1:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch pytree with batch-dim sharding (images get
    the spatial sharding too when the mesh has a 'space' axis)."""
    sh = batch_sharding(mesh)
    if hasattr(batch, "images"):
        img = image_sharding(mesh)
        return type(batch)(
            jax.device_put(batch.images, img),
            *(jax.device_put(x, sh) for x in batch[1:]))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
