#!/usr/bin/env python
"""Large-N inference benchmark: the KITTI (12k) and Redwood (20k) regimes.

At these sizes a single materialized [N, N] f32 matrix is 0.6-1.7 GB, and
the dense path streams several per layer; the fused path keeps everything
tile-resident. Honest fetch-forced timing with RTT subtraction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="12288,20480")
    ap.add_argument("--variants", default="fused,dense")
    args = ap.parse_args()
    sizes = [int(x) for x in args.sizes.split(",")]
    variants_sel = args.variants.split(",")

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC

    @jax.jit
    def trivial(x):
        return x + 1.0

    np.asarray(trivial(jnp.zeros(4)))

    def measure_rtt():
        rts_ = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(trivial(jnp.zeros(4)))
            rts_.append(time.perf_counter() - t0)
        return float(np.median(rts_))

    def chain_overhead():
        """Per-dispatch overhead of a chained-async sequence (beyond one
        RTT): measured on the trivial program."""
        ts_, rt_ = [], []
        for _ in range(3):
            rt_.append(measure_rtt())
            c = jnp.zeros(4)
            t0 = time.perf_counter()
            for _ in range(24):
                c = trivial(c)
            float(c[0])
            ts_.append(time.perf_counter() - t0)
        return max(float(np.median(ts_)) - float(np.median(rt_)), 0.0) / 24

    print(f"rtt {measure_rtt()*1000:.1f} ms", flush=True)

    all_sizes = {12288: "KITTI-12k", 20480: "Redwood-20k", 24576: "24k"}
    for n_corr in sizes:
        tag = all_sizes.get(n_corr, str(n_corr))
        model = PointDSC(
            in_dim=6, num_layers=12, num_channels=128, k=40, ratio=0.1,
            approx_knn=True,
        )
        ds = SyntheticPairDataset(num_pairs=4, num_corr=n_corr, inlier_ratio=0.3,
                                  seed=3)
        batches = []
        for i in range(4):
            s = ds[i]
            batches.append(
                (
                    jnp.asarray(s["corr_pos"])[None],
                    jnp.asarray(s["src_keypts"])[None],
                    jnp.asarray(s["tgt_keypts"])[None],
                )
            )
        # init on a small pair: params are N-independent, and running the
        # (dense) init forward at 24k materializes multiple [N, N] f32
        # buffers -> OOM before the fused variant even starts
        ds_small = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=0)
        s0 = ds_small[0]
        variables = model.init(
            jax.random.key(0),
            jnp.asarray(s0["corr_pos"])[None],
            jnp.asarray(s0["src_keypts"])[None],
            jnp.asarray(s0["tgt_keypts"])[None],
        )

        # Methodology: at these sizes one lax.map program takes too long to
        # compile, and a single dispatch is smaller than the tunnel-RTT
        # variance. Instead: 24 chained async dispatches (each depends on the
        # previous through a scalar carry, so the device serializes them),
        # ONE host fetch at the end, interleaved RTT re-measurement, and the
        # separately calibrated per-dispatch chaining overhead subtracted.
        # fused first: fresh HBM arena avoids allocator interference from
        # the dense variant's 1.6 GB matrices.
        overhead = chain_overhead()
        print(f"  per-dispatch chain overhead {overhead*1000:.2f} ms",
              flush=True)
        for variant, fused in (("fused", True), ("dense", False)):
            if variant not in variants_sel:
                continue
            try:
                @jax.jit
                def fwd(cp, s, t, carry, fused=fused):
                    out = model.apply(
                        variables, cp + 0.0 * carry, s, t, testing=True,
                        fused_attention=fused,
                    )
                    return out.final_trans[0, 0, 0]

                np.asarray(fwd(*batches[0], jnp.asarray(0.0)))
                ts, rts_ = [], []
                for _ in range(3):
                    rts_.append(measure_rtt())
                    c = jnp.asarray(0.0)
                    t0 = time.perf_counter()
                    for i in range(24):
                        c = fwd(*batches[i % 4], c)
                    float(c)
                    ts.append(time.perf_counter() - t0)
                per = max(
                    (float(np.median(ts)) - float(np.median(rts_))) / 24
                    - overhead,
                    0.0,
                )
                print(f"{tag} N={n_corr} {variant:6s}: {per*1000:8.2f} ms/pair",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag} N={n_corr} {variant:6s}: FAILED {str(e)[:100]}",
                      flush=True)


if __name__ == "__main__":
    main()
