#!/usr/bin/env python
"""Micro-split of the conf-head + prefiltered-NMS stage at PROFILE_N.

Times each sub-stage with the on-device fori_loop methodology to find
where the ~2 ms at N=20480 actually goes: the confidence MLP, the top-M
prefilter sort, the subset NMS kernel, or the final top-S selection.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PROFILE_N", 20480))
ITERS = int(os.environ.get("PROFILE_ITERS", 16))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC
    from pointdsc_tpu.kernels.conf_mlp import confidence_head
    from pointdsc_tpu.kernels.nms import (
        _nms_local_max_single, pack_nms_geometry, pick_seeds_nms_prefiltered)

    S = N // 10
    M = -(-max(max(4 * S, 4096), S) // 1024) * 1024

    model = PointDSC(in_dim=6, num_layers=12, num_channels=128, k=40, ratio=0.1)
    s0 = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=0)[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s0["corr_pos"])[None],
        jnp.asarray(s0["src_keypts"])[None],
        jnp.asarray(s0["tgt_keypts"])[None],
    )
    head = {
        f"classification_{i}": variables["params"][f"classification_{i}"]
        for i in range(3)
    }
    ds = SyntheticPairDataset(num_pairs=2, num_corr=N, inlier_ratio=0.3, seed=7)
    pairs = [ds[i] for i in range(2)]
    sk = jnp.asarray(np.stack([p["src_keypts"] for p in pairs]))
    key = jax.random.key(3)
    feats = jax.random.normal(key, (2, N, 128), jnp.float32)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    mask = jnp.ones((2, N), bool)
    conf = jax.jit(lambda f: confidence_head(f, head))(feats)

    def timed(name, make_body, *args):
        @jax.jit
        def run(a, n_iters):
            def body(i, c):
                return make_body(i, c, *a)
            return jax.lax.fori_loop(0, n_iters, body, jnp.asarray(0.0))

        bench.fetch(run(args, ITERS))
        r = bench._loop_measure(run, (args,), iters=ITERS, iters_short=4)
        print(f"{name:34s} {r['per_iter']*1000:8.3f} ms"
              f"  (diff {r['device_diff']*1000:.3f})", flush=True)

    print(f"conf+NMS split N={N} S={S} M={M} iters={ITERS}", flush=True)

    def conf_body(i, c, feats):
        f = jax.lax.dynamic_index_in_dim(feats, i % 2, keepdims=True) + 0.0 * c
        cf = confidence_head(f, head)
        return cf[0, 77]

    timed("confidence head", conf_body, feats)

    def topm_body(i, c, conf):
        cf = jax.lax.dynamic_index_in_dim(conf, i % 2, keepdims=False) + 0.0 * c
        vals_m, idx_m = jax.lax.top_k(cf, M)
        return vals_m[-1] + idx_m[0].astype(jnp.float32)

    timed(f"top-M prefilter (lax.top_k {M})", topm_body, conf)

    idx_m = jax.jit(lambda cf: jax.lax.top_k(cf, M)[1])(conf[0])
    sub_s = jnp.take(sk[0], idx_m, axis=0)
    sub_c = jnp.take(conf[0], idx_m, axis=0)

    def nmsk_body(i, c, sub_s, sub_c):
        geom = pack_nms_geometry(sub_s + 0.0 * c, sub_c, None)
        flags = _nms_local_max_single(geom, 0.10)
        return flags[77]

    timed(f"subset NMS kernel ({M})", nmsk_body, sub_s, sub_c)

    def topS_body(i, c, sub_c):
        key_m = sub_c + 0.0 * c
        kvals, kidx = jax.lax.top_k(key_m, S)
        return kvals[-1] + kidx[0].astype(jnp.float32)

    timed(f"final top-S (lax.top_k {S} of {M})", topS_body, sub_c)

    def gather_body(i, c, sk, idx_m):
        s = jax.lax.dynamic_index_in_dim(sk, i % 2, keepdims=False) + 0.0 * c
        sub = jnp.take(s, idx_m, axis=0)
        return sub[77, 0]

    timed("subset gathers", gather_body, sk, idx_m)

    def full_body(i, c, sk, conf, mask):
        b = i % 2
        cf = jax.lax.dynamic_index_in_dim(conf, b, keepdims=True) + 0.0 * c
        seeds = pick_seeds_nms_prefiltered(
            jax.lax.dynamic_index_in_dim(sk, b, keepdims=True), cf, 0.10, S,
            mask=jax.lax.dynamic_index_in_dim(mask, b, keepdims=True))
        return seeds[0, 77].astype(jnp.float32)

    timed("whole prefiltered NMS (no head)", full_body, sk, conf, mask)


if __name__ == "__main__":
    main()
