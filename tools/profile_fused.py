#!/usr/bin/env python
"""Phase-level profiling of the FUSED inference pipeline (the bench path).

tools/profile_phases.py decomposes the dense path; this decomposes the
fused one at the flagship shape so the stage-budget table in docs/PERF.md
tracks the kernels users actually run:

  1. int8 compat cache build (kernels/sc_attention.py)
  2. cache + 12 whole-layer fused encoder layers (kernels/encoder_layer.py)
  3. full fused forward with refine_iters=0 (adds conf head, NMS, NSM,
     hypothesis scoring)
  4. full fused forward (adds 20 post-refinement rounds)

Differences between consecutive lines bound each stage. Methodology
matches bench.py: STREAM pairs per dispatch via lax.map, median of reps,
interleaved RTT subtraction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PROFILE_N", 5120))
STREAM = int(os.environ.get("PROFILE_STREAM", 8))


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.kernels.encoder_layer import make_fused_layer_fn
    from pointdsc_tpu.kernels.sc_attention import build_compat_cache_int8
    from pointdsc_tpu.models.blocks import NonLocalNet
    from pointdsc_tpu.models.pointdsc import PointDSC

    model = PointDSC(in_dim=6, num_layers=12, num_channels=128, k=40, ratio=0.1)
    ds = SyntheticPairDataset(num_pairs=STREAM, num_corr=N, inlier_ratio=0.3, seed=7)
    samples = [ds[i] for i in range(STREAM)]
    stream = {
        k: jnp.asarray(np.stack([s[k] for s in samples]))
        for k in ("corr_pos", "src_keypts", "tgt_keypts")
    }
    # init at a small N: params are shape-independent, and a full dense
    # init forward at N=20480 costs minutes of compile + GBs of HBM
    # (same trick as bench.py's bench_large_n)
    s0 = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=0)[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s0["corr_pos"])[None],
        jnp.asarray(s0["src_keypts"])[None],
        jnp.asarray(s0["tgt_keypts"])[None],
    )

    @jax.jit
    def _trivial(x):
        return x + 1.0

    np.asarray(_trivial(jnp.zeros(4)))

    def rtt():
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(_trivial(jnp.zeros(4)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    print(f"fused profile N={N} stream={STREAM} rtt {rtt()*1000:.2f} ms",
          flush=True)

    results = {}

    def timed(name, fn, reps=3, chain=4):
        # chain async dispatches on top of the in-dispatch stream so the
        # tunnel RTT variance is amortized 1/(chain*STREAM) per pair
        f = jax.jit(lambda s: jnp.sum(fn(s)))
        jax.block_until_ready(f(stream))
        ts, rts = [], []
        for _ in range(reps):
            rts.append(rtt())
            t0 = time.perf_counter()
            outs = [f(stream) for _ in range(chain)]
            jax.block_until_ready(outs)
            ts.append(time.perf_counter() - t0)
        per = (
            max(float(np.median(ts)) - float(np.median(rts)), 0.0)
            / chain / STREAM * 1000
        )
        results[name] = per
        print(f"{name:42s} {per:8.3f} ms/pair", flush=True)
        return per

    def mapped(one):
        def fn(stream):
            return jax.lax.map(
                lambda args: one(*args),
                (stream["corr_pos"], stream["src_keypts"], stream["tgt_keypts"]),
            )
        return fn

    # 1. cache build alone. Consume via a strided slice: XLA cannot DCE
    # part of a pallas_call output, so the full build runs, but nothing
    # O(N^2) is re-written or re-read by the consumer (an int32 astype
    # here once cost 4 ms/pair of phantom "cache time" at N=20480).
    timed("compat int8 cache", mapped(
        lambda cp, s, t: build_compat_cache_int8(
            s[None], t[None], 0.1
        )[..., ::256, ::256].astype(jnp.int32)
    ))

    # 2. cache + whole-layer fused encoder
    enc = NonLocalNet(in_dim=6, num_layers=12, num_channels=128)
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }

    def enc_fused(cp, s, t):
        cache = build_compat_cache_int8(s[None], t[None], 0.1)
        fn = make_fused_layer_fn(cache, mask=None)
        return enc.apply(enc_vars, cp[None], None, fused_layer_fn=fn)

    timed("cache + fused encoder (12 layers)", mapped(enc_fused))

    # 3. full fused forward, no refinement
    m_norefine = model.clone(refine_iters=0)
    timed("full fused, refine_iters=0", mapped(
        lambda cp, s, t: m_norefine.apply(
            variables, cp[None], s[None], t[None], testing=True,
            fused_attention=True,
        ).final_trans
    ))

    # 4. full fused forward
    timed("full fused (refine 20)", mapped(
        lambda cp, s, t: model.apply(
            variables, cp[None], s[None], t[None], testing=True,
            fused_attention=True,
        ).final_trans
    ))

    enc_t = results["cache + fused encoder (12 layers)"]
    print("\nderived stage bounds:")
    print(f"  encoder (cache+layers)        {enc_t:8.3f}")
    print(f"  conf/NMS/NSM/scoring tail     "
          f"{results['full fused, refine_iters=0'] - enc_t:8.3f}")
    print(f"  post-refinement x20           "
          f"{results['full fused (refine 20)'] - results['full fused, refine_iters=0']:8.3f}")


if __name__ == "__main__":
    main()
