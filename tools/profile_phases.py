#!/usr/bin/env python
"""Phase-level profiling of the inference pipeline on the current backend.

Times each pipeline stage with the dispatch overhead amortized away (each
stage wrapped in a lax.map over a stream of pairs inside one jit), so the
numbers reflect device execution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 5120
STREAM = 8


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC
    from pointdsc_tpu.models.blocks import NonLocalNet
    from pointdsc_tpu.ops.compatibility import spatial_consistency
    from pointdsc_tpu.ops.knn import feature_knn
    from pointdsc_tpu.ops.nms import pick_seeds_nms

    model = PointDSC(in_dim=6, num_layers=12, num_channels=128, k=40, ratio=0.1)
    ds = SyntheticPairDataset(num_pairs=STREAM, num_corr=N, inlier_ratio=0.3, seed=7)
    samples = [ds[i] for i in range(STREAM)]
    stream = {
        k: jnp.asarray(np.stack([s[k] for s in samples]))
        for k in ("corr_pos", "src_keypts", "tgt_keypts")
    }
    variables = model.init(
        jax.random.key(0),
        stream["corr_pos"][:1],
        stream["src_keypts"][:1],
        stream["tgt_keypts"][:1],
    )

    # RTT baseline (async tunneled backends only sync on host fetch)
    @jax.jit
    def _trivial(x):
        return x + 1.0

    np.asarray(_trivial(jnp.zeros(4)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(_trivial(jnp.zeros(4)))
        rts.append(time.perf_counter() - t0)
    rtt = float(np.median(rts))
    print(f"rtt baseline {rtt*1000:.2f} ms", flush=True)

    def timed(name, fn):
        f = jax.jit(lambda s: jnp.sum(fn(s)))  # scalar fetch forces sync
        float(f(stream))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(stream))
            ts.append(time.perf_counter() - t0)
        per = max(np.median(ts) - rtt, 0.0) / STREAM * 1000
        print(f"{name:35s} {per:8.3f} ms/pair", flush=True)
        return per

    def mapped(one):
        def fn(stream):
            return jax.lax.map(
                lambda args: one(*args),
                (stream["corr_pos"], stream["src_keypts"], stream["tgt_keypts"]),
            )
        return fn

    # 1. compat matrix only
    timed("compat (src+tgt dists)", mapped(
        lambda cp, s, t: spatial_consistency(s[None], t[None], 0.1)
    ))

    # 2. full encoder (standalone NonLocalNet sharing the model's weights)
    enc = NonLocalNet(in_dim=6, num_layers=12, num_channels=128)
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }

    def enc_only(cp, s, t):
        compat = spatial_consistency(s[None], t[None], 0.1)
        return enc.apply(enc_vars, cp[None], compat)

    timed("compat + encoder (12 layers)", mapped(enc_only))

    # 3. feature knn (N x N topk)
    def knn_only(cp, s, t):
        feats = enc_only(cp, s, t)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feature_knn(feats, k=40, ignore_self=True)

    timed("... + feature knn", mapped(knn_only))

    # 4. full forward without refinement
    m_norefine = PointDSC(
        in_dim=6, num_layers=12, num_channels=128, k=40, ratio=0.1, refine_iters=0
    )
    timed("full forward, refine_iters=0", mapped(
        lambda cp, s, t: m_norefine.apply(
            variables, cp[None], s[None], t[None], testing=True
        ).final_trans
    ))

    # 5. full forward
    timed("full forward (refine 20)", mapped(
        lambda cp, s, t: model.apply(
            variables, cp[None], s[None], t[None], testing=True
        ).final_trans
    ))

    # 6. bf16 encoder variant
    m_bf16 = PointDSC(
        in_dim=6, num_layers=12, num_channels=128, k=40, ratio=0.1,
        half_precision=True,
    )
    timed("full forward bf16 encoder", mapped(
        lambda cp, s, t: m_bf16.apply(
            variables, cp[None], s[None], t[None], testing=True
        ).final_trans
    ))


if __name__ == "__main__":
    main()
