#!/usr/bin/env python
"""Dense-vs-fused quality equivalence at scale (VERDICT r2 item 7).

Evaluates a trained snapshot on held-out synthetic pairs through the three
execution paths (dense reference semantics; fused Pallas kernels with the
int8 compat cache; fused + approx-knn) and reports, per path: registration
recall / RE / TE, plus the MAXIMUM transform deviation of each fast path
from the dense path (rotation angle of R_dense^T R_fast, translation
delta) — asserting equivalence on outputs, not just on thresholded recall.

  python tools/eval_quality_equivalence.py --snapshot snapshot/synthetic_fused_run --pairs 200
  python tools/eval_quality_equivalence.py --snapshot snapshot/synthetic_kitti_run \
      --pairs 100 --regime kitti
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", default="snapshot/synthetic_fused_run")
    ap.add_argument("--pairs", type=int, default=200)
    ap.add_argument("--regime", default="3dmatch", choices=["3dmatch", "kitti"])
    ap.add_argument("--stream", type=int, default=8,
                    help="pairs per dispatch (lax.map); 1 = single dispatch "
                         "per pair (large N)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models import PointDSC
    from pointdsc_tpu.train.config import Config
    from pointdsc_tpu.train.trainer import load_model_weights

    cfg = Config.load(os.path.join(args.snapshot, "config.json"))

    from pointdsc_tpu.data.pipeline import bucket_size

    if args.regime == "kitti":
        n_corr = bucket_size(min(cfg.num_node, 12288))
        ds_kw = dict(scene_scale=50.0, noise=0.05,
                     inlier_threshold=cfg.inlier_threshold)
        re_thre, te_thre = 5.0, 60.0  # KITTI success criteria (config.py:75)
        stream = 1
    else:
        # fused kernels tile at 256/512; run at the bucket size eval uses
        n_corr = bucket_size(cfg.num_node)
        ds_kw = {}
        re_thre, te_thre = 15.0, 30.0
        stream = args.stream

    model = PointDSC(
        in_dim=cfg.in_dim, num_layers=cfg.num_layers,
        num_channels=cfg.num_channels, k=cfg.k, ratio=cfg.ratio,
        inlier_threshold=cfg.inlier_threshold, sigma_d=cfg.sigma_d,
        nms_radius=cfg.inlier_threshold,
    )
    model_approx = model.clone(approx_knn=True)

    ex = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=1)[0]
    variables = load_model_weights(
        model,
        os.path.join(args.snapshot, "models", "model_best.pkl"),
        (
            jnp.asarray(ex["corr_pos"])[None],
            jnp.asarray(ex["src_keypts"])[None],
            jnp.asarray(ex["tgt_keypts"])[None],
        ),
    )

    # held-out seeds (training used seed 17*i / 9999+i; eval uses 555+)
    ratios = [0.2, 0.35, 0.5]
    per = max(1, args.pairs // len(ratios))
    sets = [
        SyntheticPairDataset(num_pairs=per, num_corr=n_corr, inlier_ratio=r,
                             seed=555 + i, **ds_kw)
        for i, r in enumerate(ratios)
    ]
    samples = [s[i] for s in sets for i in range(len(s))]
    n_total = len(samples)

    def run_path(m, fused):
        if stream > 1:
            @jax.jit
            def run(cp, s, t):
                def one(xs):
                    out = m.apply(variables, xs[0][None], xs[1][None],
                                  xs[2][None], testing=True,
                                  fused_attention=fused)
                    return out.final_trans[0]
                return jax.lax.map(one, (cp, s, t))

            trans = []
            for lo in range(0, n_total, stream):
                chunk = samples[lo:lo + stream]
                while len(chunk) < stream:
                    chunk.append(chunk[-1])
                cp = jnp.asarray(np.stack([c["corr_pos"] for c in chunk]))
                s = jnp.asarray(np.stack([c["src_keypts"] for c in chunk]))
                t = jnp.asarray(np.stack([c["tgt_keypts"] for c in chunk]))
                trans.append(np.asarray(run(cp, s, t)))
            return np.concatenate(trans)[:n_total]

        @jax.jit
        def run1(cp, s, t):
            out = m.apply(variables, cp[None], s[None], t[None], testing=True,
                          fused_attention=fused)
            return out.final_trans[0]

        return np.stack([
            np.asarray(run1(jnp.asarray(c["corr_pos"]),
                            jnp.asarray(c["src_keypts"]),
                            jnp.asarray(c["tgt_keypts"])))
            for c in samples
        ])

    on_tpu = jax.default_backend() == "tpu"
    paths = [("dense", model, False)]
    if on_tpu:
        paths += [("fused", model, True), ("fused_approx", model_approx, True)]

    results = {}
    for name, m, fused in paths:
        results[name] = run_path(m, fused)
        print(f"[{name}] done ({n_total} pairs)")

    gt = np.stack([c["gt_trans"] for c in samples])

    def metrics(trans):
        res, tes, succ = [], [], []
        for T, G in zip(trans, gt):
            re = rot_angle_deg(T[:3, :3], G[:3, :3])
            te = np.linalg.norm(T[:3, 3] - G[:3, 3])
            res.append(re)
            tes.append(te)
            succ.append(re < re_thre and te * 100.0 < te_thre)
        succ = np.asarray(succ)
        res, tes = np.asarray(res), np.asarray(tes)
        ok = succ if succ.any() else np.ones_like(succ, bool)
        return 100.0 * succ.mean(), res[ok].mean(), tes[ok].mean()

    print(f"\nsnapshot={args.snapshot} regime={args.regime} N={n_corr} "
          f"pairs={n_total}")
    print("| path | recall | RE (deg) | TE (m) | max dRot vs dense (deg) | "
          "max dT vs dense (m) |")
    print("|---|---|---|---|---|---|")
    for name in results:
        rec, re, te = metrics(results[name])
        if name == "dense":
            drot, dt = 0.0, 0.0
        else:
            drot = max(
                rot_angle_deg(a[:3, :3], b[:3, :3])
                for a, b in zip(results["dense"], results[name])
            )
            dt = max(
                float(np.linalg.norm(a[:3, 3] - b[:3, 3]))
                for a, b in zip(results["dense"], results[name])
            )
        print(f"| {name} | {rec:.1f}% | {re:.3f} | {te:.3f} | {drot:.4f} | "
              f"{dt:.4f} |")


if __name__ == "__main__":
    main()
