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
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC

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
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    for n_corr, tag in ((12288, "KITTI-12k"), (20480, "Redwood-20k")):
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
        variables = model.init(jax.random.key(0), *batches[0])

        # fused first: measuring it on a fresh HBM arena avoids allocator
        # interference from the dense variant's 1.6 GB matrices
        for variant, fused in (("fused", True), ("dense", False)):
            try:
                @jax.jit
                def fwd(cp, s, t, fused=fused):
                    out = model.apply(
                        variables, cp, s, t, testing=True, fused_attention=fused
                    )
                    return jnp.sum(out.final_trans)

                float(fwd(*batches[0]))
                ts = []
                for i in range(1, 4):
                    t0 = time.perf_counter()
                    float(fwd(*batches[i]))
                    ts.append(time.perf_counter() - t0)
                per = max(float(np.median(ts)) - rtt, 0.0) * 1000
                print(f"{tag} N={n_corr} {variant:6s}: {per:8.2f} ms/pair",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag} N={n_corr} {variant:6s}: FAILED {str(e)[:100]}",
                      flush=True)


if __name__ == "__main__":
    main()
