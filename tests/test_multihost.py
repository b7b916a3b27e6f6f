"""Multi-host skeleton: 2-process jax.distributed over CPU.

Validates pointdsc_tpu.parallel.distributed end-to-end: coordinator
bring-up, global device visibility, process-sharded data split, and a
cross-process psum through a global mesh (SURVEY.md §2 collective-backend
row: jax.distributed.initialize + XLA collectives).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from pointdsc_tpu.parallel import distributed as D

rank = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
D.initialize(coordinator_address="127.0.0.1:" + port, num_processes=2,
             process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 procs x 2 cpu devs

# host-side pair split: disjoint, covering
mine = D.process_shard(10)
import numpy as np
exp = np.arange(rank, 10, 2)
assert (mine == exp).all(), (mine, exp)

# cross-process collective through the global mesh
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = D.global_mesh()
x = jnp.ones((4, 8)) * (rank + 1)
y = jax.jit(
    lambda a: jax.lax.psum(a, "dp"),
    in_shardings=NamedSharding(mesh, P("dp")),
    out_shardings=NamedSharding(mesh, P()),
)
import functools
from jax.experimental.shard_map import shard_map
f = jax.jit(shard_map(lambda a: jax.lax.psum(jnp.sum(a), "dp"), mesh=mesh,
                      in_specs=P("dp"), out_specs=P()))
from jax.experimental import multihost_utils
ga = multihost_utils.process_allgather(jnp.asarray([float(rank)]))
total = float(f(multihost_utils.host_local_array_to_global_array(
    np.ones((2, 8)), mesh, P("dp"))))
with open(out + f".{rank}", "w") as fh:
    fh.write(f"{total} {list(np.asarray(ga).ravel())}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    out = str(tmp_path / "result")
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port, out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    for rank in range(2):
        total, ga = open(out + f".{rank}").read().split(" ", 1)
        # 4 global shards x sum(ones((2,8)) local shard rows)... the global
        # array is (4,8) ones (2 rows per process), psum over dp of per-shard
        # sums = total sum = 32
        assert float(total) == 32.0, (rank, total)
        assert "0.0" in ga and "1.0" in ga  # saw both processes' values
