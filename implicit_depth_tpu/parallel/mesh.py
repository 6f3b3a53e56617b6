"""Device mesh construction and batch sharding.

TPU-native replacement for the reference's DDP stack (torch.multiprocessing
spawn + NCCL process groups + DistributedSampler, src/trainers/
train_lidf.py:667-692): one SPMD program over a ``jax.sharding.Mesh`` whose
``data`` axis spans all chips (ICI within a slice, DCN across slices via
``jax.distributed.initialize``). Batches are sharded on the leading axis;
parameters are replicated; gradient averaging is an XLA ``psum`` inserted by
GSPMD — there is no DDP wrapper, no barrier, no reduce_tensor.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Put a host batch on device, sharded along the leading (batch) dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
