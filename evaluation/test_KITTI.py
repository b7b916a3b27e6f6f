#!/usr/bin/env python
"""KITTI benchmark CLI (parity with /root/reference/evaluation/test_KITTI.py).

Applies the reference's cross-dataset eval overrides when evaluating a
3DMatch-trained snapshot on KITTI (test_KITTI.py:166-170): tau=0.6,
sigma_d=1.2, RE<5 deg, TE<60 cm, num_node=12000.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def str2bool(v):
    return str(v).lower() in ("true", "1")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--chosen_snapshot", default="", type=str)
    parser.add_argument("--solver", default="SVD", type=str, choices=["SVD", "RANSAC"])
    parser.add_argument("--use_icp", default=False, type=str2bool)
    parser.add_argument("--save_npy", default=False, type=str2bool)
    parser.add_argument(
        "--fused_attention", default="auto", choices=["auto", "true", "false"],
        help="Pallas fused attention kernels (auto: on for TPU backends)",
    )
    parser.add_argument(
        "--sharded", default=False, type=str2bool,
        help="fan pairs across all local devices (data-parallel eval)",
    )
    parser.add_argument(
        "--sp", default=False, type=str2bool,
        help="sequence-parallel eval: row-shard each pair's N^2 encoder "
        "stage over all local devices (for correspondence counts beyond "
        "one chip's HBM); mutually exclusive with --sharded",
    )
    parser.add_argument("--root", default="", type=str)
    parser.add_argument("--num_node", default=12000, type=int)
    args = parser.parse_args(argv)
    if args.sp and args.sharded:
        parser.error("--sp and --sharded are mutually exclusive")

    import jax.numpy as jnp

    from pointdsc_tpu.data.kitti import KITTIDataset
    from pointdsc_tpu.eval.protocol import format_scene_report
    from pointdsc_tpu.eval.runner import Evaluator
    from pointdsc_tpu.models import PointDSC
    from pointdsc_tpu.train.config import Config
    from pointdsc_tpu.train.trainer import load_model_weights
    from pointdsc_tpu.utils.seed import set_seed

    cfg = Config.load(f"snapshot/{args.chosen_snapshot}/config.json")
    if args.root:
        cfg.root = args.root
    # cross-dataset generalization overrides (reference test_KITTI.py:166-170)
    cfg.inlier_threshold = 0.6
    cfg.sigma_d = 1.2
    cfg.re_thre = 5.0
    cfg.te_thre = 60.0
    set_seed(cfg.seed)

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

    dataset = KITTIDataset(
        root=cfg.root,
        split="test",
        descriptor=cfg.descriptor,
        in_dim=cfg.in_dim,
        inlier_threshold=cfg.inlier_threshold,
        num_node=args.num_node,
        use_mutual=cfg.use_mutual,
        augment_axis=0,
        augment_rotation=0.0,
        augment_translation=0.0,
    )
    example = dataset[0]
    variables = load_model_weights(
        model,
        f"snapshot/{args.chosen_snapshot}/models/model_best.pkl",
        (
            jnp.asarray(example["corr_pos"])[None],
            jnp.asarray(example["src_keypts"])[None],
            jnp.asarray(example["tgt_keypts"])[None],
        ),
    )

    import jax

    fused = args.fused_attention == "true" or (
        args.fused_attention == "auto" and jax.default_backend() == "tpu"
    )
    sp_mesh = None
    if args.sp:
        from jax.sharding import Mesh

        sp_mesh = Mesh(np.asarray(jax.devices()), ("sp",))
    evaluator = Evaluator(
        model, variables, re_thre=cfg.re_thre, te_thre=cfg.te_thre,
        use_icp=args.use_icp, icp_threshold=cfg.inlier_threshold,
        solver=args.solver, fused_attention=fused, sp_mesh=sp_mesh,
    )
    if args.sharded:
        stats, agg = evaluator.run_dataset_sharded(dataset)
    else:
        stats, agg = evaluator.run_dataset(dataset)
    report = format_scene_report(agg)
    print(report)

    os.makedirs("logs", exist_ok=True)
    log_path = f"logs/{args.chosen_snapshot}-{args.solver}-{cfg.descriptor}-KITTI.log"
    with open(log_path, "a") as f:
        f.write(report + "\n")
    if args.save_npy:
        np.save(log_path.replace(".log", ".npy"), stats)
    return stats, agg


if __name__ == "__main__":
    main()
