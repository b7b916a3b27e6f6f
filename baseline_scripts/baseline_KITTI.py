#!/usr/bin/env python
"""Classical-baseline benchmark on KITTI (parity with
/root/reference/baseline_scripts/baseline_KITTI.py).

Same methods as the 3DMatch baseline CLI (SM / RANSAC / GCRANSAC / LS /
PMC), evaluated with the outdoor thresholds the reference uses
(inlier tau = 0.6 m, success = RE < 5 deg and TE < 60 cm,
baseline_KITTI.py:26-27). Output is the shared 12-column stats protocol.

Usage: python baseline_scripts/baseline_KITTI.py --method RANSAC --root ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--method", default="RANSAC",
        choices=["SM", "RANSAC", "GCRANSAC", "LS", "PMC"]
    )
    parser.add_argument("--root", default="/data/KITTI", type=str)
    parser.add_argument("--descriptor", default="fcgf", choices=["fcgf", "fpfh"])
    parser.add_argument("--split", default="test", type=str)
    parser.add_argument("--num_node", default=5000, type=int)
    parser.add_argument("--inlier_threshold", default=0.60, type=float)
    parser.add_argument("--max_iteration", default=4096, type=int)
    parser.add_argument("--re_thre", default=5.0, type=float)
    parser.add_argument("--te_thre", default=60.0, type=float)
    parser.add_argument("--save_npy", default=False, type=lambda v: v in ("true", "1"))
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.baselines import (
        gc_ransac_registration,
        least_squares_fit,
        pmc_registration,
        ransac_registration,
        spectral_matching,
    )
    from pointdsc_tpu.data.kitti import KITTIDataset
    from pointdsc_tpu.eval.protocol import aggregate_stats, format_scene_report, pair_stats
    from pointdsc_tpu.utils.seed import set_seed
    from pointdsc_tpu.utils.timer import Timer

    set_seed(51)
    dataset = KITTIDataset(
        root=args.root,
        split=args.split,
        descriptor=args.descriptor,
        inlier_threshold=args.inlier_threshold,
        num_node=args.num_node,
        use_mutual=False,
        augment_axis=0,
        augment_rotation=0.0,
        augment_translation=0.0,
    )

    rows = []
    timer = Timer()
    key = jax.random.key(0)
    for i in range(len(dataset)):
        sample = dataset[i]
        src = jnp.asarray(sample["src_keypts"])[None]
        tgt = jnp.asarray(sample["tgt_keypts"])[None]
        timer.tic()
        if args.method == "SM":
            trans, labels = spectral_matching(src, tgt, args.inlier_threshold)
        elif args.method == "RANSAC":
            key, sub = jax.random.split(key)
            trans, labels = ransac_registration(
                src, tgt, sub, args.inlier_threshold,
                num_hypotheses=args.max_iteration,
            )
        elif args.method == "GCRANSAC":
            key, sub = jax.random.split(key)
            trans, labels = gc_ransac_registration(
                src, tgt, sub, args.inlier_threshold,
                num_hypotheses=args.max_iteration,
            )
        elif args.method == "LS":
            trans, labels = least_squares_fit(
                src, tgt, jnp.asarray(sample["gt_labels"])[None]
            )
        else:  # PMC
            trans_np, labels_np = pmc_registration(
                sample["src_keypts"], sample["tgt_keypts"], args.inlier_threshold
            )
            trans, labels = jnp.asarray(trans_np)[None], jnp.asarray(labels_np)[None]
        model_time = timer.toc(average=False, block_on=trans)

        rows.append(
            pair_stats(
                np.asarray(trans)[0],
                np.asarray(labels)[0],
                sample["gt_trans"],
                sample["gt_labels"],
                args.re_thre,
                args.te_thre,
                model_time,
                0.0,
                0,  # KITTI has a single scene group
            )
        )
        if (i + 1) % 100 == 0:
            print(f"[{i + 1}/{len(dataset)}]")

    stats = np.stack(rows)
    agg = aggregate_stats(stats, ["KITTI"])
    print(format_scene_report(agg))
    if args.save_npy:
        os.makedirs("logs", exist_ok=True)
        np.save(f"logs/baseline-kitti-{args.method}-{args.descriptor}.npy", stats)
    return stats, agg


if __name__ == "__main__":
    main()
