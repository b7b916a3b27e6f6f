#!/usr/bin/env python
"""Large-N inference benchmark: the KITTI (12k) and Redwood (20k) regimes.

At these sizes a single materialized [N, N] f32 matrix is 0.6-1.7 GB, and
the dense path streams several per layer; the fused path keeps everything
tile-resident.

Methodology (round 5, matches bench.py::bench_large_n): the iteration loop
lives ON DEVICE (lax.fori_loop cycling 4 resident pairs, dynamic trip
count so one compile serves both chain lengths). One dispatch covers all
iterations, so tunnel dispatch-streaming stalls — which made the round-4
python-dispatch chain read anywhere from 6.7 to 12.7 ms for the same code
— cannot touch the measurement. Two estimators are reported per variant:
RTT-subtracted (wall(16) - rtt)/16 with per-rep spread, and double-length
differencing (wall(16) - wall(4))/12 which cancels the RTT exactly.
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
    ap.add_argument("--variants", default="exact,approx",
                    help="comma list of exact,approx,dense")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
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

    print(f"rtt {measure_rtt()*1000:.1f} ms", flush=True)
    iters, iters_short, reps = args.iters, 4, args.reps

    all_sizes = {12288: "KITTI-12k", 20480: "Redwood-20k", 24576: "24k"}
    for n_corr in sizes:
        tag = all_sizes.get(n_corr, str(n_corr))
        ds = SyntheticPairDataset(num_pairs=4, num_corr=n_corr,
                                  inlier_ratio=0.3, seed=3)
        stack = tuple(
            jnp.asarray(np.stack([ds[i][key] for i in range(4)]))
            for key in ("corr_pos", "src_keypts", "tgt_keypts")
        )
        # init on a small pair: params are N-independent, and running the
        # (dense) init forward at 24k materializes multiple [N, N] f32
        # buffers -> OOM before the fused variant even starts
        s0 = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=0)[0]

        for variant in variants_sel:
            fused = variant != "dense"
            model = PointDSC(
                in_dim=6, num_layers=12, num_channels=128, k=40, ratio=0.1,
                approx_knn=(variant == "approx"),
            )
            variables = model.init(
                jax.random.key(0),
                jnp.asarray(s0["corr_pos"])[None],
                jnp.asarray(s0["src_keypts"])[None],
                jnp.asarray(s0["tgt_keypts"])[None],
            )
            try:
                @jax.jit
                def run(cp, s, t, n_iters, model=model, variables=variables,
                        fused=fused):
                    def body(i, c):
                        b = i % 4
                        out = model.apply(
                            variables,
                            jax.lax.dynamic_index_in_dim(cp, b) + 0.0 * c,
                            jax.lax.dynamic_index_in_dim(s, b),
                            jax.lax.dynamic_index_in_dim(t, b),
                            testing=True, fused_attention=fused,
                        )
                        return out.final_trans[0, 0, 0]

                    return jax.lax.fori_loop(0, n_iters, body,
                                             jnp.asarray(0.0))

                np.asarray(run(*stack, iters))  # compile
                long_w, short_w, rtts = [], [], []
                for _ in range(reps):
                    rtts.append(measure_rtt())
                    t0 = time.perf_counter()
                    np.asarray(run(*stack, iters))
                    long_w.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    np.asarray(run(*stack, iters_short))
                    short_w.append(time.perf_counter() - t0)
                rtt_sub = [max(w - r, 0.0) / iters
                           for w, r in zip(long_w, rtts)]
                diff = (np.median(long_w) - np.median(short_w)) / (
                    iters - iters_short
                )
                spread = " ".join(f"{t*1000:.2f}" for t in rtt_sub)
                print(
                    f"{tag} N={n_corr} {variant:6s}: "
                    f"{np.median(rtt_sub)*1000:8.3f} ms/pair  "
                    f"(diff x-check {diff*1000:.3f}; reps {spread})",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"{tag} N={n_corr} {variant:6s}: FAILED {str(e)[:100]}",
                      flush=True)


if __name__ == "__main__":
    main()
