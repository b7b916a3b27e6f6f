#!/usr/bin/env python
"""Decompose the post-encoder tail of the fused pipeline (NSM et al.).

tools/profile_fused.py bounds the tail as one block (full-minus-encoder);
this times each stage standalone with realistic shapes/values so the perf
effort lands on the measured top item. Also races the three seed-kNN
selection strategies (fused Pallas kernel / XLA hierarchical exact_topk /
approx_max_k) at the current shape — the gate in models/pointdsc.py
(_SEED_KNN_FUSED_MIN_N) should follow these numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PROFILE_N", 5120))
STREAM = int(os.environ.get("PROFILE_STREAM", 8))
K = 40


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC

    model = PointDSC(in_dim=6, num_layers=12, num_channels=128, k=K, ratio=0.1)
    # init at a small N: params are shape-independent, and a full dense
    # init forward at N=20480 costs minutes of compile + GBs of HBM
    # (same trick as bench.py's bench_large_n)
    s0 = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=7)[0]
    cp = jnp.asarray(s0["corr_pos"])[None]
    sk = jnp.asarray(s0["src_keypts"])[None]
    tk = jnp.asarray(s0["tgt_keypts"])[None]
    variables = model.init(jax.random.key(0), cp, sk, tk)

    # realistic encoder features for the whole stream
    ds2 = SyntheticPairDataset(num_pairs=STREAM, num_corr=N, inlier_ratio=0.3,
                               seed=7)
    samples = [ds2[i] for i in range(STREAM)]
    stream = {
        k: jnp.asarray(np.stack([x[k] for x in samples]))
        for k in ("corr_pos", "src_keypts", "tgt_keypts")
    }

    @jax.jit
    def encode(cp_, s_, t_):
        from pointdsc_tpu.kernels.encoder_layer import make_fused_layer_fn
        from pointdsc_tpu.kernels.sc_attention import build_compat_cache_int8
        from pointdsc_tpu.models.blocks import NonLocalNet

        enc = NonLocalNet(in_dim=6, num_layers=12, num_channels=128)
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        cache = build_compat_cache_int8(s_, t_, 0.1)
        fn = make_fused_layer_fn(cache, mask=None)
        f = enc.apply(enc_vars, cp_, None, fused_layer_fn=fn)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    feats = jnp.concatenate(
        [encode(stream["corr_pos"][i:i + 1], stream["src_keypts"][i:i + 1],
                stream["tgt_keypts"][i:i + 1]) for i in range(STREAM)]
    )  # [STREAM, N, C]
    mask = jnp.ones((STREAM, N), bool)
    S = N // 10
    seeds = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None] * 7 % N, (STREAM, 1))

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

    print(f"tail profile N={N} S={S} k={K} stream={STREAM} "
          f"rtt {rtt()*1000:.2f} ms", flush=True)

    def timed(name, fn, reps=3, chain=16):
        # chained async dispatch: enqueue `chain` executions and block once,
        # so the tunnel RTT is amortized 1/chain — a single-dispatch
        # subtraction clamps every sub-ms stage to 0 when the RTT is tens
        # of ms (same methodology as bench.py's bench_large_n)
        f = jax.jit(fn)
        jax.block_until_ready(f())
        ts, rts = [], []
        for _ in range(reps):
            rts.append(rtt())
            t0 = time.perf_counter()
            outs = [f() for _ in range(chain)]
            jax.block_until_ready(outs)
            ts.append(time.perf_counter() - t0)
        per = (
            max(float(np.median(ts)) - float(np.median(rts)), 0.0)
            / chain / STREAM * 1000
        )
        print(f"{name:44s} {per:8.3f} ms/pair", flush=True)
        return per

    # ---- seed-kNN selection strategies
    def knn_kernel():
        from pointdsc_tpu.kernels.seed_knn import seed_knn_exact

        return seed_knn_exact(feats, seeds, K, mask=mask).astype(jnp.float32)

    def knn_xla_exact():
        from pointdsc_tpu.ops.knn import exact_topk

        sf = jnp.take_along_axis(feats, seeds[:, :, None], axis=1)
        d = 2.0 - 2.0 * jnp.einsum("bsc,bnc->bsn", sf, feats)
        cols = jnp.arange(N)[None, None, :]
        d = jnp.where(cols == seeds[:, :, None], 1e9, d)
        return exact_topk(-d, K).astype(jnp.float32)

    def knn_approx():
        sf = jnp.take_along_axis(feats, seeds[:, :, None], axis=1)
        d = 2.0 - 2.0 * jnp.einsum("bsc,bnc->bsn", sf, feats)
        cols = jnp.arange(N)[None, None, :]
        d = jnp.where(cols == seeds[:, :, None], 1e9, d)
        _, i = jax.lax.approx_max_k(-d, K, recall_target=0.95)
        return i.astype(jnp.float32)

    timed("seed-kNN fused Pallas kernel (exact)", knn_kernel)
    timed("seed-kNN XLA einsum + exact_topk", knn_xla_exact)
    timed("seed-kNN approx_max_k (recall .95)", knn_approx)

    # ---- downstream NSM stages (fixed neighbor set)
    from pointdsc_tpu.kernels.seed_knn import seed_knn_exact

    knn_idx = jax.jit(
        lambda: seed_knn_exact(feats, seeds, K, mask=mask)
    )()
    sigma = variables["params"]["sigma"]

    def gather_bundle():
        C = feats.shape[-1]
        bundle = jnp.concatenate(
            [feats, stream["src_keypts"], stream["tgt_keypts"],
             mask.astype(feats.dtype)[..., None]], axis=-1)
        flat = knn_idx.reshape(STREAM, -1)
        g = jnp.take_along_axis(bundle, flat[..., None], axis=1)
        return g.reshape(STREAM, S, K, C + 7)

    g = jax.jit(gather_bundle)()
    knn_features = g[..., :128]
    src_knn, tgt_knn = g[..., 128:131], g[..., 131:134]
    knn_mask = g[..., 134] > 0.5

    timed("wide gather (features+coords)", gather_bundle)

    def build_M():
        feat_M = jnp.einsum("bskc,bsjc->bskj", knn_features, knn_features)
        feat_M = jnp.clip(1.0 - (1.0 - feat_M) / (sigma * sigma), 0.0, None)

        def pdist(x):
            diff = x[..., :, None, :] - x[..., None, :, :]
            return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

        spat = pdist(src_knn) - pdist(tgt_knn)
        spat_M = jnp.clip(1.0 - spat**2 / 0.01, 0.0, None)
        M = feat_M * spat_M
        M = M * (1.0 - jnp.eye(K, dtype=M.dtype))
        pm = knn_mask[..., :, None] & knn_mask[..., None, :]
        return jnp.where(pm, M, 0.0)

    M = jax.jit(build_M)()
    timed("k x k compat build (feat_M * spat_M)", build_M)

    def power_iter():
        from pointdsc_tpu.ops.eig import power_iteration

        return power_iteration(M, 10)

    w = jax.jit(power_iter)()
    timed("power iteration x10", power_iter)

    def procrustes():
        from pointdsc_tpu.ops.procrustes import weighted_procrustes

        ww = jnp.abs(w) * knn_mask
        ww = ww / (jnp.sum(ww, axis=-1, keepdims=True) + 1e-6)
        return weighted_procrustes(src_knn, tgt_knn, ww)

    trans = jax.jit(procrustes)()
    timed("weighted procrustes per seed", procrustes)

    def scoring():
        from pointdsc_tpu.kernels.scoring import seed_inlier_counts

        return seed_inlier_counts(
            trans, stream["src_keypts"], stream["tgt_keypts"], 0.10, mask=mask
        )

    timed("hypothesis scoring kernel", scoring)

    def conf_nms():
        from pointdsc_tpu.kernels.conf_mlp import confidence_head
        from pointdsc_tpu.kernels.nms import pick_seeds_nms_fused

        head = {
            f"classification_{i}": variables["params"][f"classification_{i}"]
            for i in range(3)
        }
        conf = confidence_head(feats, head)
        return pick_seeds_nms_fused(
            stream["src_keypts"], conf, 0.10, S, mask=mask
        ).astype(jnp.float32)

    timed("confidence head + fused NMS", conf_nms)


if __name__ == "__main__":
    main()
