#!/usr/bin/env python
"""Decompose NSM mid-section + post-refinement device costs at N=5120.

Each candidate phase is timed inside one jit over a stream of 8 pairs
(lax.map), fetch-forced, RTT-subtracted — same methodology as bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 5120
S = 512
K = 40
C = 128
STREAM = 8


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.ops.eig import power_iteration
    from pointdsc_tpu.ops.procrustes import weighted_procrustes

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((STREAM, N, C), dtype=np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    src = rng.standard_normal((STREAM, N, 3), dtype=np.float32)
    tgt = rng.standard_normal((STREAM, N, 3), dtype=np.float32)
    seeds = np.stack(
        [rng.choice(N, size=S, replace=False) for _ in range(STREAM)]
    ).astype(np.int32)
    stream = dict(
        feats=jnp.asarray(feats),
        src=jnp.asarray(src),
        tgt=jnp.asarray(tgt),
        seeds=jnp.asarray(seeds),
    )

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
    print(f"rtt {rtt*1000:.2f} ms", flush=True)

    def timed(name, one):
        @jax.jit
        def f(st):
            out = jax.lax.map(
                lambda args: one(*args),
                (st["feats"], st["src"], st["tgt"], st["seeds"]),
            )
            return jnp.sum(out)

        float(f(stream))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(stream))
            ts.append(time.perf_counter() - t0)
        per = max(np.median(ts) - rtt, 0.0) / STREAM * 1000
        print(f"{name:42s} {per:8.3f} ms/pair", flush=True)
        return per

    def seed_dist(f, s, t, sd):
        sf = jnp.take_along_axis(f, sd[:, None], axis=0)  # [S, C]
        d = 2.0 - 2.0 * sf @ f.T  # [S, N]
        return d

    def topk(f, s, t, sd):
        d = seed_dist(f, s, t, sd)
        _, idx = jax.lax.approx_max_k(-d, K, recall_target=1.0)
        return idx.astype(jnp.float32)

    def knn_idx_fn(f, s, t, sd):
        d = seed_dist(f, s, t, sd)
        _, idx = jax.lax.approx_max_k(-d, K, recall_target=1.0)
        return idx

    def gather_taa(f, s, t, sd):
        idx = knn_idx_fn(f, s, t, sd)
        bundle = jnp.concatenate([f, s, t], axis=-1)  # [N, C+6]
        g = jnp.take_along_axis(
            bundle, idx.reshape(-1)[:, None], axis=0
        ).reshape(S, K, C + 6)
        return g

    def gather_onehot(f, s, t, sd):
        idx = knn_idx_fn(f, s, t, sd)
        bundle = jnp.concatenate([f, s, t], axis=-1)  # [N, C+6]
        oh = (
            idx.reshape(-1)[:, None] == jnp.arange(N)[None, :]
        )  # [S*K, N] bool
        g = jax.lax.dot_general(
            oh.astype(jnp.bfloat16),
            bundle.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(S, K, C + 6)
        return g

    def nsm_from_gather(gather):
        def run(f, s, t, sd):
            g = gather(f, s, t, sd)
            kf = g[..., :C]
            ks = g[..., C : C + 3]
            kt = g[..., C + 3 : C + 6]
            feat_M = jnp.einsum("skc,sjc->skj", kf, kf)
            feat_M = jnp.clip(1.0 - (1.0 - feat_M) / 0.01, 0.0, None)

            def pdist(x):
                diff = x[..., :, None, :] - x[..., None, :, :]
                return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

            sdiff = pdist(ks) - pdist(kt)
            spat_M = jnp.clip(1.0 - sdiff**2 / 0.01, 0.0, None)
            M = feat_M * spat_M * (1.0 - jnp.eye(K))
            w = power_iteration(M, 10)
            w = jnp.abs(w)
            w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)
            trans = weighted_procrustes(ks, kt, w)
            return trans

        return run

    def scoring(f, s, t, sd):
        trans = nsm_from_gather(gather_taa)(f, s, t, sd)
        pred = jnp.einsum("sij,nj->sni", trans[:, :3, :3], s) + trans[:, None, :3, 3]
        d = jnp.linalg.norm(pred - t[None], axis=-1)
        fit = jnp.sum(d < 0.1, axis=-1)
        return fit.astype(jnp.float32)

    def refine(iters):
        def run(f, s, t, sd):
            trans = jnp.eye(4)

            def body(i, tr):
                warped = s @ tr[:3, :3].T + tr[:3, 3]
                dist = jnp.linalg.norm(warped - t, axis=-1)
                inl = dist < 0.1
                w = inl.astype(jnp.float32) / (1.0 + (dist / 0.1) ** 2)
                return weighted_procrustes(s, t, w)

            return jax.lax.fori_loop(0, iters, body, trans)

        return run

    timed("seed dist matmul [S,N]", seed_dist)
    timed("+ exact topk (PartialReduce)", topk)
    timed("+ gather take_along_axis", gather_taa)
    timed("+ gather one-hot matmul", gather_onehot)
    timed("+ NSM (taa gather)", nsm_from_gather(gather_taa))
    timed("+ NSM (one-hot gather)", nsm_from_gather(gather_onehot))
    timed("+ hypothesis scoring", scoring)
    timed("refine x1 (procrustes@N)", refine(1))
    timed("refine x20", refine(20))

    # pieces of one refinement iteration
    def procrustes_only(f, s, t, sd):
        w = jnp.ones((N,), jnp.float32)
        return weighted_procrustes(s, t, w)

    timed("weighted_procrustes@N alone", procrustes_only)

    from pointdsc_tpu.ops.linalg import symeig4x4

    def jacobi_only(f, s, t, sd):
        A = s[:4, :3] @ s[:4, :3].T + jnp.eye(4)
        _, V = symeig4x4(A)
        return V

    timed("symeig4x4 single (10 sweeps)", jacobi_only)


if __name__ == "__main__":
    main()
