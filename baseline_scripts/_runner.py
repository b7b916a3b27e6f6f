"""Shared classical-baseline evaluation loop.

Both baseline CLIs (3DMatch and KITTI) run the same protocol — method
dispatch over SM / RANSAC / GCRANSAC / LS / PMC, per-pair timing, the
12-column stats row, scene aggregation — differing only in dataset,
thresholds and the SM top-ratio. Keeping the loop in one place keeps
protocol fixes in one place.
"""

from __future__ import annotations

import os

import numpy as np


def str2bool(v) -> bool:
    return str(v).lower() in ("true", "1")


def run_baseline(dataset, scene_list, scene_of, args, sm_top_ratio=0.1,
                 save_tag=""):
    """Evaluate args.method over `dataset`; returns (stats [P, 12], agg).

    scene_list: scene names for aggregation; scene_of: index -> scene id.
    """
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.baselines import (
        gc_ransac_registration,
        least_squares_fit,
        pmc_registration,
        ransac_registration,
        spectral_matching,
    )
    from pointdsc_tpu.eval.protocol import (
        aggregate_stats,
        format_scene_report,
        pair_stats,
    )
    from pointdsc_tpu.utils.timer import Timer

    rows = []
    timer = Timer()
    key = jax.random.key(0)
    for i in range(len(dataset)):
        sample = dataset[i]
        src = jnp.asarray(sample["src_keypts"])[None]
        tgt = jnp.asarray(sample["tgt_keypts"])[None]
        timer.tic()
        if args.method == "SM":
            trans, labels = spectral_matching(
                src, tgt, args.inlier_threshold, top_ratio=sm_top_ratio
            )
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
                minimizer=getattr(args, "gc_minimizer", "icm"),
            )
        elif args.method == "LS":
            trans, labels = least_squares_fit(
                src, tgt, jnp.asarray(sample["gt_labels"])[None]
            )
        else:  # PMC
            trans_np, labels_np = pmc_registration(
                sample["src_keypts"], sample["tgt_keypts"],
                args.inlier_threshold,
            )
            trans = jnp.asarray(trans_np)[None]
            labels = jnp.asarray(labels_np)[None]
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
                scene_of(i),
            )
        )
        if (i + 1) % 100 == 0:
            print(f"[{i + 1}/{len(dataset)}]")

    stats = np.stack(rows)
    agg = aggregate_stats(stats, scene_list)
    print(format_scene_report(agg))
    if args.save_npy:
        os.makedirs("logs", exist_ok=True)
        np.save(
            f"logs/baseline{save_tag}-{args.method}-{args.descriptor}.npy",
            stats,
        )
    return stats, agg
