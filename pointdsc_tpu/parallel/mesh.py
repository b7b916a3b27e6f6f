"""Device-mesh sharding helpers.

The reference is single-process single-GPU (SURVEY.md section 2: no DDP, no
collectives). The TPU-native scaling story is data parallelism over the pair
batch: a 1-D `dp` mesh, batches sharded on axis 0, parameters replicated, and
XLA inserting the psum for the gradient all-reduce. Eval fans independent
pairs across chips the same way.

The model itself (1.2 M params, N up to 20k correspondences) fits one chip;
tensor/pipeline parallelism would add collectives without benefit. If N ever
outgrows one chip's HBM the blockwise Pallas attention kernel is the place to
shard rows (ring softmax), not the module tree.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` local devices
    (0 = all)."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard axis 0 (the pair batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Device-put every array in the batch pytree, sharded on axis 0."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
