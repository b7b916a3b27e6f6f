#!/usr/bin/env python
"""3DMatch benchmark CLI (parity with /root/reference/evaluation/test_3DMatch.py).

Usage:
    python evaluation/test_3DMatch.py --chosen_snapshot <exp_id> \
        [--solver SVD|RANSAC] [--use_icp true] [--save_npy true]

Loads snapshot/<exp_id>/config.json + models/model_best.pkl, evaluates the 8
test scenes with the 12-column stats protocol, writes
logs/<snapshot>-<solver>-<descriptor>[-ICP].log.
"""

import argparse
import json
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
    parser.add_argument("--root", default="", type=str, help="override data root")
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
    args = parser.parse_args(argv)
    if args.sp and args.sharded:
        parser.error("--sp and --sharded are mutually exclusive")

    import jax.numpy as jnp

    from pointdsc_tpu.data.threedmatch import TEST_SCENES, ThreeDMatchTest
    from pointdsc_tpu.eval.protocol import format_scene_report
    from pointdsc_tpu.eval.runner import Evaluator
    from pointdsc_tpu.models import PointDSC
    from pointdsc_tpu.train.config import Config
    from pointdsc_tpu.train.trainer import load_model_weights
    from pointdsc_tpu.utils.seed import set_seed

    cfg = Config.load(f"snapshot/{args.chosen_snapshot}/config.json")
    if args.root:
        cfg.root = args.root
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
        nms_radius=cfg.inlier_threshold,  # reference passes tau as NMS radius
    )

    dataset = ThreeDMatchTest(
        root=cfg.root,
        descriptor=cfg.descriptor,
        in_dim=cfg.in_dim,
        inlier_threshold=cfg.inlier_threshold,
        num_node="all",
        use_mutual=cfg.use_mutual,
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
        stats, agg = evaluator.run_dataset_sharded(
            dataset, scene_of=dataset.scene_of
        )
    else:
        stats, agg = evaluator.run_dataset(dataset, scene_of=dataset.scene_of)
    report = format_scene_report(agg)
    print(report)

    os.makedirs("logs", exist_ok=True)
    suffix = "-ICP" if args.use_icp else ""
    log_path = f"logs/{args.chosen_snapshot}-{args.solver}-{cfg.descriptor}{suffix}.log"
    with open(log_path, "a") as f:
        f.write(report + "\n")
    if args.save_npy:
        np.save(log_path.replace(".log", ".npy"), stats)
        print(f"Save the stats in {log_path.replace('.log', '.npy')}")
    return stats, agg


if __name__ == "__main__":
    main()
