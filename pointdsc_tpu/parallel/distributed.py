"""Multi-host (DCN) scaling skeleton.

The reference has no distributed layer at all (SURVEY.md §2: the only
"communication" is host<->device copies). The TPU-native fleet story is:

  * `initialize()` — one `jax.distributed.initialize` call per host; after
    it, `jax.devices()` spans every chip in the slice and a `Mesh` over
    them makes XLA route the dp all-reduce over ICI within a host and DCN
    across hosts.
  * `global_mesh()` — the 1-D dp mesh over ALL processes' devices.
  * `process_shard()` — host-side data sharding of a pair list: each
    process loads only its own slice (the eval/training input pipeline is
    per-host; device sharding of the batch axis then happens inside the
    mesh as usual).

Single-process use is unaffected: every helper degrades to the local-mesh
behavior when `jax.process_count() == 1`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Wrapper over jax.distributed.initialize.

    On TPU pods all arguments are auto-detected from the environment; on
    CPU/GPU fleets pass them explicitly (coordinator 'host:port', world
    size, rank).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def process_shard(num_items: int, process_index: int | None = None,
                  process_count: int | None = None) -> np.ndarray:
    """Indices of the pair list this host should load (strided split, so
    scenes/pair difficulty stay balanced across hosts)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, num_items, pc)


def all_gather_rows(local_rows: np.ndarray, axis_name: str = "dp"):
    """Gather per-host stats rows onto every host via one jitted
    all-gather over the global mesh (tiny payload; correctness over
    cleverness). Rows must have identical shape on every host."""
    import jax.numpy as jnp
    from jax.experimental.multihost_utils import process_allgather

    return np.asarray(process_allgather(jnp.asarray(local_rows)))
