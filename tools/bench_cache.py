#!/usr/bin/env python
"""Microbench the int8 compat-cache builder at large N on the live backend.

The e2e profile at N=20480 attributes ~8 ms/pair to the cache build whose
HBM write floor is ~0.55 ms; this sweeps tile shapes and math variants to
find where the time goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("BENCH_N", 20480))
REPS = int(os.environ.get("BENCH_REPS", 10))


def measure(fn, *args):
    import jax

    out = fn(*args)
    np.asarray(jax.device_get(out[0, :8, :8]))  # force through the tunnel
    # RTT estimate interleaved
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out[0, :8, :8]))
        ts.append(time.perf_counter() - t0)
    # RTT: fetch the same small slice without recompute
    rtts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(out[0, :8, :8]))
        rtts.append(time.perf_counter() - t0)
    return float(np.median(ts) - np.median(rtts))


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.kernels.sc_attention import _build_compat_cache_single, pack_geometry

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((1, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, N, 3)), jnp.float32)
    geom = jax.vmap(lambda s, t: pack_geometry(s, t, None))(src, tgt)

    print(f"N={N}, int8 bytes={N*N/1e6:.0f} MB, write floor ~{N*N/820e9*1e3:.2f} ms")

    for bq, bk in [(1024, 2048), (512, 2048), (2048, 2048), (1024, 4096),
                   (2048, 4096), (512, 4096), (256, 4096)]:
        if N % bq or N % bk:
            continue
        fn = jax.jit(lambda g, bq=bq, bk=bk: jax.vmap(
            lambda gg: _build_compat_cache_single(gg, 0.1, block_q=bq, block_k=bk,
                                                  interpret=False))(g))
        try:
            t = measure(fn, geom)
            print(f"  bq={bq:5d} bk={bk:5d}: {t*1e3:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  bq={bq:5d} bk={bk:5d}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
