#!/usr/bin/env python
"""Trustworthy per-stage profile at large N: on-device fori_loop timing.

The chained-python-dispatch profiles (profile_fused/profile_tail) carry
~±0.5 ms/pair of tunnel noise at N=20480 — enough to misrank tail stages.
This tool times each stage with bench.py's round-5 methodology: the stage
runs inside a lax.fori_loop with a DYNAMIC trip count (one compile serves
both lengths), 5 reps of wall(long) - wall(short) differencing, so the
tunnel RTT and any fixed dispatch cost cancel exactly and only device
time per iteration remains.

Stages (all at PROFILE_N, defaults to 20480 / the Redwood regime):
  cache        int8 compat cache build (kernels/sc_attention.py)
  layer        ONE split-fused encoder layer (kernels/encoder_layer.py)
  seed_knn     fused exact seed-kNN kernel (kernels/seed_knn.py)
  nsm_mid      gather -> kxk compat -> power iter -> Procrustes
  scoring      hypothesis scoring kernel (kernels/scoring.py)
  conf_nms     confidence head + prefiltered exact NMS (the model path)
  refine       fused post-refinement x20 (kernels/refine.py)

Sum(stages) should bound the e2e bench number from below (12x layer);
the gap is inter-stage XLA glue.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PROFILE_N", 20480))
K = 40
ITERS = int(os.environ.get("PROFILE_ITERS", 16))
ONLY = os.environ.get("PROFILE_ONLY", "")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC

    model = PointDSC(in_dim=6, num_layers=12, num_channels=128, k=K, ratio=0.1)
    s0 = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=0)[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s0["corr_pos"])[None],
        jnp.asarray(s0["src_keypts"])[None],
        jnp.asarray(s0["tgt_keypts"])[None],
    )
    ds = SyntheticPairDataset(num_pairs=2, num_corr=N, inlier_ratio=0.3, seed=7)
    pairs = [ds[i] for i in range(2)]
    cp = jnp.asarray(np.stack([p["corr_pos"] for p in pairs]))
    sk = jnp.asarray(np.stack([p["src_keypts"] for p in pairs]))
    tk = jnp.asarray(np.stack([p["tgt_keypts"] for p in pairs]))

    S = N // 10

    def timed(name, make_body, *args):
        """make_body(i, *args) -> scalar f32; loops on device."""
        if ONLY and name not in ONLY.split(","):
            return

        @jax.jit
        def run(a, n_iters):
            def body(i, c):
                return make_body(i, c, *a)

            return jax.lax.fori_loop(0, n_iters, body, jnp.asarray(0.0))

        bench.fetch(run(args, ITERS))  # compile
        r = bench._loop_measure(run, (args,), iters=ITERS, iters_short=4)
        spread = ", ".join(f"{x*1000:.3f}" for x in r["spread"])
        print(
            f"{name:34s} {r['per_iter']*1000:8.3f} ms"
            f"  (diff x-check {r['device_diff']*1000:.3f}; reps [{spread}])",
            flush=True,
        )

    print(f"device-loop profile N={N} S={S} k={K} iters={ITERS}", flush=True)

    # ---- stage: cache build
    from pointdsc_tpu.kernels.sc_attention import build_compat_cache_int8

    def cache_body(i, c, cp, sk, tk):
        b = i % 2
        cache = build_compat_cache_int8(
            jax.lax.dynamic_index_in_dim(sk, b) + 0.0 * c,
            jax.lax.dynamic_index_in_dim(tk, b),
            0.1,
        )
        return cache[0, 777, 777].astype(jnp.float32)

    timed("cache build (int8)", cache_body, cp, sk, tk)

    # ---- stage: one split-fused encoder layer
    from pointdsc_tpu.kernels.encoder_layer import make_fused_layer_fn
    from pointdsc_tpu.models.blocks import NonLocalNet

    enc = NonLocalNet(in_dim=6, num_layers=1, num_channels=128)
    # init at small N (params are shape-independent; a dense init forward
    # at N=20480 would materialize [N, N] f32)
    enc_vars = enc.init(
        jax.random.key(1),
        jnp.zeros((1, 256, 6)),
        jnp.zeros((1, 256, 256)),
    )
    cache0 = jax.jit(
        lambda s, t: build_compat_cache_int8(s[:1], t[:1], 0.1)
    )(sk, tk)
    x0 = jnp.broadcast_to(cp[:1, :, :6], (1, N, 6))

    def layer_body(i, c, x0, cache0):
        fn = make_fused_layer_fn(cache0, mask=None)
        out = enc.apply(enc_vars, x0 + 0.0 * c, None, fused_layer_fn=fn)
        return out[0, 777, 7]

    timed("1x split-fused layer", layer_body, x0, cache0)

    # ---- realistic features for the tail stages: run the full model once
    # and pull normed_features (done once, outside the timing loops)
    out = jax.jit(
        lambda cp_, s_, t_: model.apply(
            variables, cp_, s_, t_, testing=True, fused_attention=True
        )
    )(cp, sk, tk)
    feats = out.normed_features  # [2, N, C]
    conf = out.confidence
    mask = jnp.ones((2, N), bool)
    seeds = jnp.tile((jnp.arange(S, dtype=jnp.int32) * 7) % N, (2, 1))
    sigma = variables["params"]["sigma"]

    # ---- stage: fused exact seed-kNN
    from pointdsc_tpu.kernels.seed_knn import seed_knn_exact

    def knn_body(i, c, feats, seeds, mask):
        b = i % 2
        idx = seed_knn_exact(
            jax.lax.dynamic_index_in_dim(feats, b) + 0.0 * c,
            jax.lax.dynamic_index_in_dim(seeds, b),
            K,
            mask=jax.lax.dynamic_index_in_dim(mask, b),
        )
        return idx[0, 77, 7].astype(jnp.float32)

    timed("seed-kNN exact (fused)", knn_body, feats, seeds, mask)

    def knn_approx_body(i, c, feats, seeds, mask):
        b = i % 2
        f = jax.lax.dynamic_index_in_dim(feats, b) + 0.0 * c
        sd = jax.lax.dynamic_index_in_dim(seeds, b)
        sf = jnp.take_along_axis(f, sd[:, :, None], axis=1)
        d = 2.0 - 2.0 * jnp.einsum("bsc,bnc->bsn", sf, f)
        cols = jnp.arange(N)[None, None, :]
        d = jnp.where(cols == sd[:, :, None], 1e9, d)
        _, idx = jax.lax.approx_max_k(-d, K, recall_target=0.95)
        return idx[0, 77, 7].astype(jnp.float32)

    timed("seed-kNN approx_max_k", knn_approx_body, feats, seeds, mask)

    # ---- stage: NSM mid (gather -> kxk M -> power iter -> Procrustes)
    from pointdsc_tpu.ops.eig import power_iteration
    from pointdsc_tpu.ops.procrustes import weighted_procrustes

    knn_idx = jax.jit(
        lambda f, s, m: seed_knn_exact(f, s, K, mask=m)
    )(feats, seeds, mask)

    def nsm_body(i, c, feats, knn_idx, sk, tk, mask):
        b = i % 2
        f = jax.lax.dynamic_index_in_dim(feats, b, keepdims=True) + 0.0 * c
        ki = jax.lax.dynamic_index_in_dim(knn_idx, b, keepdims=True)
        s_ = jax.lax.dynamic_index_in_dim(sk, b, keepdims=True)
        t_ = jax.lax.dynamic_index_in_dim(tk, b, keepdims=True)
        m_ = jax.lax.dynamic_index_in_dim(mask, b, keepdims=True)
        C = f.shape[-1]
        bundle = jnp.concatenate(
            [f, s_, t_, m_.astype(f.dtype)[..., None]], axis=-1)
        flat = ki.reshape(1, -1)
        g = jnp.take_along_axis(bundle, flat[..., None], axis=1).reshape(
            1, S, K, C + 7)
        kf, s_knn, t_knn = g[..., :C], g[..., C:C + 3], g[..., C + 3:C + 6]
        km = g[..., C + 6] > 0.5
        feat_M = jnp.einsum("bskc,bsjc->bskj", kf, kf)
        feat_M = jnp.clip(1.0 - (1.0 - feat_M) / (sigma * sigma), 0.0, None)

        def pdist(x):
            diff = x[..., :, None, :] - x[..., None, :, :]
            return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

        spat = pdist(s_knn) - pdist(t_knn)
        M = feat_M * jnp.clip(1.0 - spat**2 / 0.01, 0.0, None)
        M = M * (1.0 - jnp.eye(K, dtype=M.dtype))
        pm = km[..., :, None] & km[..., None, :]
        M = jnp.where(pm, M, 0.0)
        w = power_iteration(M, 10)
        w = jnp.abs(w) * km
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)
        trans = weighted_procrustes(s_knn, t_knn, w)
        return trans[0, 77, 0, 0]

    timed("NSM mid (gather..procrustes)", nsm_body, feats, knn_idx, sk, tk,
          mask)

    # ---- stage: hypothesis scoring
    from pointdsc_tpu.kernels.scoring import seed_inlier_counts

    def mk_trans(knn_idx, sk, tk):
        return jax.vmap(
            lambda ki, s_, t_: weighted_procrustes(
                jnp.take(s_, ki.reshape(-1), axis=0).reshape(S, K, 3),
                jnp.take(t_, ki.reshape(-1), axis=0).reshape(S, K, 3),
                jnp.ones((S, K)) / K,
            )
        )(knn_idx, sk, tk)

    strans = jax.jit(mk_trans)(knn_idx, sk, tk)

    def scoring_body(i, c, strans, sk, tk, mask):
        b = i % 2
        counts = seed_inlier_counts(
            jax.lax.dynamic_index_in_dim(strans, b, keepdims=True),
            jax.lax.dynamic_index_in_dim(sk, b, keepdims=True) + 0.0 * c,
            jax.lax.dynamic_index_in_dim(tk, b, keepdims=True),
            0.10,
            mask=jax.lax.dynamic_index_in_dim(mask, b, keepdims=True),
        )
        return counts[0, 77].astype(jnp.float32)

    timed("hypothesis scoring", scoring_body, strans, sk, tk, mask)

    # ---- stage: confidence head + prefiltered exact NMS (the model path)
    from pointdsc_tpu.kernels.conf_mlp import confidence_head
    from pointdsc_tpu.kernels.nms import pick_seeds_nms_prefiltered

    head = {
        f"classification_{i}": variables["params"][f"classification_{i}"]
        for i in range(3)
    }

    def conf_nms_body(i, c, feats, sk, mask):
        b = i % 2
        f = jax.lax.dynamic_index_in_dim(feats, b, keepdims=True) + 0.0 * c
        cf = confidence_head(f, head)
        seeds = pick_seeds_nms_prefiltered(
            jax.lax.dynamic_index_in_dim(sk, b, keepdims=True), cf, 0.10, S,
            mask=jax.lax.dynamic_index_in_dim(mask, b, keepdims=True),
        )
        return seeds[0, 77].astype(jnp.float32)

    timed("conf head + prefiltered NMS", conf_nms_body, feats, sk, mask)

    # ---- stage: fused post-refinement x20
    from pointdsc_tpu.kernels.refine import fused_post_refinement

    init_t = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))

    def refine_body(i, c, init_t, sk, tk, mask):
        b = i % 2
        out = fused_post_refinement(
            jax.lax.dynamic_index_in_dim(init_t, b, keepdims=True),
            jax.lax.dynamic_index_in_dim(sk, b, keepdims=True) + 0.0 * c,
            jax.lax.dynamic_index_in_dim(tk, b, keepdims=True),
            jax.lax.dynamic_index_in_dim(mask, b, keepdims=True),
            0.10, 20,
        )
        return out[0, 0, 0]

    timed("post-refinement x20", refine_body, init_t, sk, tk, mask)


if __name__ == "__main__":
    main()
