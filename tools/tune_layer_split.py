#!/usr/bin/env python
"""Tile sweep for the split whole-layer kernel (kernels/encoder_layer.py,
N > MAX_FUSED_LAYER_N): phase-B attention+MLP+residual dominates, so sweep
its (block_q, block_k). Chained scan with a scalar fetch (see
tools/tune_attention2.py for the methodology notes)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20480)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.kernels.encoder_layer import _fused_layer_split_single
    from pointdsc_tpu.kernels.sc_attention import build_compat_cache_int8

    n, c = args.n, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-3, 3, (1, n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-3, 3, (1, n, 3)).astype(np.float32))
    compat = build_compat_cache_int8(src, tgt, 0.10)[0]
    kbias = jnp.zeros((8, n), jnp.float32)
    weights = tuple(
        jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)
        for s in [(c, c), (c,), (c, 3 * c), (3 * c,), (c, c // 2), (c // 2,),
                  (c // 2, c // 2), (c // 2,), (c // 2, c), (c,)]
    )

    @jax.jit
    def trivial(z):
        return z + 1.0

    np.asarray(trivial(jnp.zeros(4)))

    def rtt():
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(trivial(jnp.zeros(4)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    total = args.layers * args.chains

    def bench(bq, bk):
        @jax.jit
        def run(x0, compat_, kbias_):
            def layer(xx, _):
                out = _fused_layer_split_single(
                    xx, compat_, kbias_, weights, block_q=bq, block_k=bk,
                    has_bias=False, interpret=False,
                )
                return out, None

            xf, _ = jax.lax.scan(layer, x0, None, length=total)
            return xf.sum()

        try:
            np.asarray(run(x, compat, kbias))
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk}: FAILED {str(e)[:90]}", flush=True)
            return
        ts, rs = [], []
        for _ in range(args.reps):
            rs.append(rtt())
            t0 = time.perf_counter()
            np.asarray(run(x, compat, kbias))
            ts.append(time.perf_counter() - t0)
        ms = (np.median(ts) - np.median(rs)) * 1000
        print(f"bq={bq} bk={bk}: {ms / total:.3f} ms/layer", flush=True)

    default = [(1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048),
               (512, 2048), (4096, 1024), (4096, 512), (4096, 2048)]
    env = os.environ.get("TUNE_TILES")
    tiles = (
        [tuple(int(v) for v in t.split("x")) for t in env.split(",")]
        if env else default
    )
    for bq, bk in tiles:
        if n % bq or n % bk:
            continue
        bench(bq, bk)


if __name__ == "__main__":
    main()
