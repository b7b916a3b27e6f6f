#!/usr/bin/env python
"""Pairwise registration evaluation on Redwood/Augmented ICL-NUIM scenes
(parity with /root/reference/multiway/test_multi.py: the pairwise-only
variant of the multiway benchmark -- every fragment pair is registered
independently and scored with the 12-column protocol)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--chosen_snapshot", default="", type=str)
    parser.add_argument("--root", default="/data/Augmented_ICL-NUIM", type=str)
    parser.add_argument("--descriptor", default="fpfh", type=str)
    parser.add_argument("--num_node", default=5000, type=int)
    parser.add_argument(
        "--scenes",
        default="livingroom1-simulated,livingroom2-simulated,"
        "office1-simulated,office2-simulated",
        type=str,
    )
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.redwood import RedwoodDataset
    from pointdsc_tpu.eval.protocol import format_scene_report
    from pointdsc_tpu.eval.runner import Evaluator
    from pointdsc_tpu.models import PointDSC
    from pointdsc_tpu.train.config import Config, default_config
    from pointdsc_tpu.train.trainer import load_model_weights

    if args.chosen_snapshot:
        cfg = Config.load(f"snapshot/{args.chosen_snapshot}/config.json")
    else:
        cfg = default_config("3DMatch")
    cfg.descriptor = args.descriptor

    model = PointDSC(
        in_dim=cfg.in_dim,
        num_layers=cfg.num_layers,
        num_channels=cfg.num_channels,
        num_iterations=cfg.num_iterations,
        ratio=cfg.ratio,
        sigma_d=cfg.sigma_d,
        k=cfg.k,
        inlier_threshold=cfg.inlier_threshold,
        nms_radius=cfg.inlier_threshold,
    )

    all_stats = []
    scene_names = args.scenes.split(",")
    for scene_ind, scene in enumerate(scene_names):
        dataset = RedwoodDataset(
            root=args.root,
            select_scene=scene,
            descriptor=cfg.descriptor,
            in_dim=cfg.in_dim,
            inlier_threshold=cfg.inlier_threshold,
            num_node=args.num_node,
            use_mutual=True,
        )
        example = dataset[0]
        ckpt = f"snapshot/{args.chosen_snapshot}/models/model_best.pkl"
        inputs = (
            jnp.asarray(example["corr_pos"])[None],
            jnp.asarray(example["src_keypts"])[None],
            jnp.asarray(example["tgt_keypts"])[None],
        )
        if args.chosen_snapshot and os.path.exists(ckpt):
            variables = load_model_weights(model, ckpt, inputs)
        else:
            variables = model.init(jax.random.key(0), *inputs)
        evaluator = Evaluator(model, variables, re_thre=cfg.re_thre, te_thre=cfg.te_thre)
        stats, agg = evaluator.run_dataset(dataset, scene_of=lambda i: scene_ind)
        print(f"Scene {scene}:")
        print(format_scene_report(agg))
        all_stats.append(stats)

    import numpy as np
    from pointdsc_tpu.eval.protocol import aggregate_stats

    total = np.concatenate(all_stats)
    print("=== All scenes ===")
    print(format_scene_report(aggregate_stats(total, scene_names)))


if __name__ == "__main__":
    main()
