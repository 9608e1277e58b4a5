"""Device mesh + sharding helpers — the TPU replacement for the reference's DDP.

The reference's only parallelism is data parallelism over NCCL (SURVEY.md §2.8).
Here: a 1-D `jax.sharding.Mesh` over ICI; batches are sharded on the 'dp' axis,
parameters are replicated, and gradient averaging is XLA's job (jit inserts the
psum when a replicated output depends on sharded inputs). `reduce_tensor`
(all_reduce mean) becomes a jnp.mean under jit; DistributedSampler becomes
per-host path sharding (data.datasets.iterate_batches).

Multi-host: call jax.distributed.initialize() before make_mesh() and the same
code runs over DCN+ICI unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
