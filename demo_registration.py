#!/usr/bin/env python
"""End-to-end registration demo on a pair of .ply clouds
(parity with /root/reference/demo_registration.py).

Pipeline: PLY load -> FPFH extraction (TPU-native, no Open3D) -> descriptor
NN matching -> PointDSC -> SE(3) transform. Writes the warped source cloud
next to the inputs instead of opening an interactive viewer (headless
environment; pass --out_dir to control placement).

Usage:
    python demo_registration.py \
        --src_path demo_data/cloud_bin_0.ply --tgt_path demo_data/cloud_bin_1.ply \
        [--chosen_snapshot <exp_id>] [--descriptor fpfh] [--use_icp true]

Without a snapshot the model runs with randomly initialized encoder weights:
the spatial-consistency machinery (NSM + Procrustes + refinement) does not
depend on learned features and still produces a usable transform; a trained
snapshot improves the seeding quality.
"""

import argparse
import os

import numpy as np


def str2bool(v):
    return str(v).lower() in ("true", "1")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--chosen_snapshot", default="", type=str)
    parser.add_argument(
        "--src_path", default="/root/reference/demo_data/cloud_bin_0.ply", type=str
    )
    parser.add_argument(
        "--tgt_path", default="/root/reference/demo_data/cloud_bin_1.ply", type=str
    )
    parser.add_argument("--descriptor", default="fpfh", choices=["fpfh"])
    parser.add_argument("--voxel_size", default=0.03, type=float)
    parser.add_argument("--use_icp", default=False, type=str2bool)
    parser.add_argument("--out_dir", default="demo_out", type=str)
    parser.add_argument("--num_node", default=2048, type=int)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.pipeline import build_correspondences, pad_to_bucket
    from pointdsc_tpu.data.ply import read_ply_xyz, write_ply_xyz
    from pointdsc_tpu.descriptors import extract_fpfh
    from pointdsc_tpu.models import PointDSC
    from pointdsc_tpu.ops.icp import icp_point_to_point
    from pointdsc_tpu.train.config import Config, default_config
    from pointdsc_tpu.train.trainer import load_model_weights
    from pointdsc_tpu.data import transforms_np as T

    if args.chosen_snapshot:
        cfg = Config.load(f"snapshot/{args.chosen_snapshot}/config.json")
    else:
        cfg = default_config("3DMatch")
        cfg.descriptor = "fpfh"

    print(f"Loading clouds:\n  src: {args.src_path}\n  tgt: {args.tgt_path}")
    src_raw = read_ply_xyz(args.src_path)
    tgt_raw = read_ply_xyz(args.tgt_path)

    print("Extracting FPFH descriptors (TPU)...")
    src_pts, src_feat = extract_fpfh(src_raw, voxel_size=args.voxel_size)
    tgt_pts, tgt_feat = extract_fpfh(tgt_raw, voxel_size=args.voxel_size)
    src_feat = src_feat / (np.linalg.norm(src_feat, axis=1, keepdims=True) + 1e-6)
    tgt_feat = tgt_feat / (np.linalg.norm(tgt_feat, axis=1, keepdims=True) + 1e-6)
    print(f"  {len(src_pts)} / {len(tgt_pts)} keypoints")

    sample = build_correspondences(
        src_pts,
        tgt_pts,
        src_feat,
        tgt_feat,
        np.eye(4),
        cfg.inlier_threshold,
        num_node=args.num_node,
        use_mutual=False,
        in_dim=cfg.in_dim,
        rng=np.random.default_rng(cfg.seed),
    )

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
    padded = pad_to_bucket(sample)
    inputs = (
        jnp.asarray(padded["corr_pos"])[None],
        jnp.asarray(padded["src_keypts"])[None],
        jnp.asarray(padded["tgt_keypts"])[None],
    )
    ckpt = f"snapshot/{args.chosen_snapshot}/models/model_best.pkl"
    if args.chosen_snapshot and os.path.exists(ckpt):
        variables = load_model_weights(model, ckpt, inputs)
        print(f"Loaded weights from {ckpt}")
    else:
        variables = model.init(jax.random.key(0), *inputs)
        print("No snapshot weights; running with random-init encoder")

    print("Running PointDSC...")
    out = model.apply(
        variables, *inputs, mask=jnp.asarray(padded["mask"])[None], testing=True
    )
    trans = np.asarray(out.final_trans)[0]
    n_inlier = int(np.asarray(out.final_labels).sum())
    print(f"Predicted transform ({n_inlier} inliers):\n{trans}")

    if args.use_icp:
        trans_j, fitness, rmse = icp_point_to_point(
            jnp.asarray(src_pts, jnp.float32),
            jnp.asarray(tgt_pts, jnp.float32),
            jnp.asarray(trans, jnp.float32),
            max_correspondence_distance=cfg.inlier_threshold,
        )
        trans = np.asarray(trans_j)
        print(f"After ICP (fitness {float(fitness):.3f}, rmse {float(rmse):.4f}):\n{trans}")

    os.makedirs(args.out_dir, exist_ok=True)
    warped = T.transform(src_raw, trans)
    write_ply_xyz(os.path.join(args.out_dir, "src_warped.ply"), warped)
    write_ply_xyz(os.path.join(args.out_dir, "tgt.ply"), tgt_raw)
    np.save(os.path.join(args.out_dir, "pred_trans.npy"), trans)
    print(f"Wrote {args.out_dir}/src_warped.ply, tgt.ply, pred_trans.npy")
    return trans


if __name__ == "__main__":
    main()
