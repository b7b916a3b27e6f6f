#!/usr/bin/env python
"""Sweep fused SC-attention kernel configs vs the dense path (12 layers).

Times 12 back-to-back attention applications (the encoder's attention load)
inside one jit, amortizing dispatch overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 5120
C = 128
LAYERS = 12


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.kernels.sc_attention import fused_sc_attention
    from pointdsc_tpu.ops.compatibility import spatial_consistency

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, N, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, N, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, N, C)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-1, 1, (1, N, 3)).astype(np.float32))
    tgt = jnp.asarray(src + rng.normal(size=(1, N, 3)).astype(np.float32) * 0.05)

    def dense12(q, k, v, src, tgt):
        compat = spatial_consistency(src, tgt, 0.1)
        x = v
        for _ in range(LAYERS):
            logits = jnp.einsum("bnc,bmc->bnm", q, x) / jnp.sqrt(128.0)
            w = jax.nn.softmax(compat * logits, axis=-1)
            x = jnp.einsum("bnm,bmc->bnc", w, x)
        return x

    # RTT baseline: async tunneled backends only sync on host fetch
    @jax.jit
    def trivial(x):
        return x + 1.0

    np.asarray(trivial(jnp.zeros(4)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.zeros(4)))
        rts.append(time.perf_counter() - t0)
    rtt = float(np.median(rts))
    print(f"rtt baseline {rtt*1000:.2f} ms", flush=True)

    def bench(name, fn):
        try:
            f = jax.jit(lambda *a: jnp.sum(fn(*a)))  # scalar fetch forces sync
            float(f(q, k, v, src, tgt))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(q, k, v, src, tgt))
                ts.append(time.perf_counter() - t0)
            total = max(np.median(ts) - rtt, 0.0)
            print(
                f"{name:40s} {total*1000:8.2f} ms total  "
                f"{total/LAYERS*1000:6.3f} ms/layer",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 -- sweep must survive OOM configs
            print(f"{name:40s} FAILED: {str(e)[:120]}", flush=True)

    bench("dense (materialized compat)", dense12)

    for bq, bk, bf16 in [
        (128, 512, True),
        (256, 512, False),
        (256, 512, True),
        (512, 512, True),
        (256, 1024, True),
        (512, 1024, True),
    ]:
        def fused12(q, k, v, src, tgt, bq=bq, bk=bk, bf16=bf16):
            x = v
            for _ in range(LAYERS):
                x = fused_sc_attention(
                    q, k, x, src, tgt, 0.1,
                    block_q=bq, block_k=bk, interpret=False, use_bf16=bf16,
                )
            return x

        bench(f"fused bq={bq} bk={bk} bf16={bf16}", fused12)


if __name__ == "__main__":
    main()
