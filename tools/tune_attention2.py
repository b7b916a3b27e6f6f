#!/usr/bin/env python
"""Standalone cached-attention kernel sweep (round 3).

Measures the int8-cached SC-attention kernel in isolation (12 applications,
like the encoder) at a given N over tile-shape variants, to find the config
that closes the gap to the HBM floor. Honest fetch-forced timing with RTT
subtraction; stream of layers inside one jit so dispatch is amortized.

  python tools/tune_attention2.py --n 5120
  python tools/tune_attention2.py --n 20480
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chains", type=int, default=8,
                    help="scan length multiplier so on-device work dwarfs RTT")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.kernels.sc_attention import (
        _fused_sc_attention_cached_single,
        build_compat_cache_int8,
        pack_geometry,
    )

    n, c = args.n, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    compat = build_compat_cache_int8(src[None], tgt[None], 0.10)[0]
    geom = pack_geometry(src, tgt, None)

    qb = q.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)

    @jax.jit
    def trivial(x):
        return x + 1.0

    def rtt():
        np.asarray(trivial(jnp.zeros(4)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(trivial(jnp.zeros(4)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def bench(make_call, tag):
        # all big arrays as explicit args: closed-over constants are
        # serialized into the remote-compile request (HTTP 413 at 20k).
        # Chain layers*chains applications in one scan and fetch ONE
        # scalar: fetching the [N, C] f32 output (10 MB at 20k) over the
        # tunnel would dominate the measurement.
        total = args.layers * args.chains

        @jax.jit
        def run(q0, kk_, vv_, compat_, geom_):
            def layer(x, _):
                out = make_call(x, kk_, vv_, compat_, geom_)
                return out.astype(x.dtype), None

            x, _ = jax.lax.scan(layer, q0, None, length=total)
            return x.sum()

        try:
            np.asarray(run(qb, kb, vb, compat, geom))
        except Exception as e:
            print(f"{tag}: FAILED ({str(e).splitlines()[0][:120]})")
            return
        ts, rs = [], []
        for _ in range(args.reps):
            rs.append(rtt())
            t0 = time.perf_counter()
            np.asarray(run(qb, kb, vb, compat, geom))
            ts.append(time.perf_counter() - t0)
        ms = (np.median(ts) - np.median(rs)) * 1000
        print(f"{tag}: {ms:.3f} ms / {total} applications "
              f"({ms / total:.3f} ms/layer)")

    for bq, bk in [(1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048),
                   (4096, 1024), (1024, 4096)]:
        if n % bq or n % bk:
            continue
        bench(
            lambda x, kk_, vv_, cc_, gg_, bq=bq, bk=bk:
            _fused_sc_attention_cached_single(
                x, kk_, vv_, cc_, gg_, block_q=bq, block_k=bk,
                interpret=False,
            ),
            f"cached int8 bq={bq} bk={bk}",
        )


if __name__ == "__main__":
    main()
