#!/usr/bin/env python
"""Batch FCGF descriptor preparation (reference misc/cal_fcgf.py:86-195).

Same dataset walks as tools/cal_fpfh.py but with the VoxelFCGF network
(dense-voxel ResUNet, the TPU-native stand-in for the MinkowskiEngine sparse
U-Net). Writes `<name>_fcgf.npz` (keys: points, xyz, feature).

A trained checkpoint (from pointdsc_tpu/descriptors/fcgf_train.py /
tools/train_fcgf.py) is passed with --checkpoint; without one the network
runs with random weights, which is only useful for pipeline smoke tests —
the CLI warns loudly.

KITTI pair/gt building (reference misc/cal_fcgf.py:198-340) lives in
pointdsc_tpu/data/kitti_prep.py.

Usage:
  python tools/cal_fcgf.py --job 3dmatch_test --root /data/3DMatch \
      --checkpoint fcgf_3dmatch.pkl --voxel_size 0.05
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pointdsc_tpu.data.ply import read_ply_xyz
from pointdsc_tpu.data.redwood import REDWOOD_SCENES
from pointdsc_tpu.data.threedmatch import TEST_SCENES


def load_fcgf(checkpoint: str | None, out_dim: int = 32, channels=None):
    """Build the VoxelFCGF model + variables (random init if no checkpoint)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from pointdsc_tpu.descriptors.fcgf import VoxelFCGF

    kwargs = {"out_dim": out_dim}
    if channels is not None:
        kwargs["enc_channels"] = tuple(channels)
    model = VoxelFCGF(**kwargs)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    if checkpoint:
        with open(checkpoint, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
        print(f"loaded VoxelFCGF weights from {checkpoint}")
    else:
        print("WARNING: no --checkpoint given; extracting with RANDOM "
              "weights (pipeline smoke tests only, descriptors are useless)")
    return model, variables


def _process_cloud(model, variables, points, out_path, voxel_size, grid_size,
                   tiled, verbose=True):
    from pointdsc_tpu.descriptors.fcgf import extract_features, extract_features_tiled

    if points.shape[0] == 0:
        print(f"{out_path}: empty cloud, skipped")
        return
    if tiled:
        xyz, feature = extract_features_tiled(
            model, variables, points, voxel_size, grid_size
        )
    else:
        xyz, feature = extract_features(
            model, variables, points, voxel_size, grid_size
        )
    np.savez_compressed(
        out_path,
        points=np.asarray(points, np.float32),
        xyz=np.asarray(xyz, np.float32),
        feature=np.asarray(feature, np.float32),
    )
    if verbose:
        print(out_path, feature.shape)


def run_job(job, root, model, variables, voxel_size, grid_size, tiled,
            scenes=None, verbose=True):
    n = 0
    if job == "3dmatch":
        src_dir = os.path.join(root, "threedmatch")
        out_dir = os.path.join(root, "threedmatch_feat")
        os.makedirs(out_dir, exist_ok=True)
        for path in sorted(glob.glob(os.path.join(src_dir, "*.npz"))):
            data = np.load(path)
            if "pcd" not in data:
                continue
            name = os.path.basename(path).replace(".npz", "_fcgf.npz")
            _process_cloud(model, variables, data["pcd"],
                           os.path.join(out_dir, name), voxel_size,
                           grid_size, tiled, verbose)
            n += 1
    elif job == "3dmatch_test":
        for scene in scenes or TEST_SCENES:
            for path in sorted(
                glob.glob(os.path.join(root, "fragments", scene, "*.ply"))
            ):
                _process_cloud(model, variables, read_ply_xyz(path),
                               path.replace(".ply", "_fcgf.npz"),
                               voxel_size, grid_size, tiled, verbose)
                n += 1
    elif job == "redwood":
        for scene in scenes or REDWOOD_SCENES:
            for path in sorted(
                glob.glob(os.path.join(root, scene, "fragments", "*.ply"))
            ):
                _process_cloud(model, variables, read_ply_xyz(path),
                               path.replace(".ply", "_fcgf.npz"),
                               voxel_size, grid_size, tiled, verbose)
                n += 1
    else:
        raise ValueError(job)
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--job", required=True,
                    choices=["3dmatch", "3dmatch_test", "redwood"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--checkpoint", type=str, default="")
    ap.add_argument("--voxel_size", type=float, default=0.05)
    ap.add_argument("--grid_size", type=int, default=96)
    ap.add_argument("--out_dim", type=int, default=32)
    ap.add_argument("--tiled", action="store_true",
                    help="overlapping-tile extraction for large extents")
    ap.add_argument("--scenes", type=str, default="all")
    args = ap.parse_args(argv)

    model, variables = load_fcgf(args.checkpoint or None, args.out_dim)
    scenes = None if args.scenes == "all" else args.scenes.split(",")
    n = run_job(args.job, args.root, model, variables, args.voxel_size,
                args.grid_size, args.tiled, scenes)
    print(f"wrote FCGF features for {n} fragments")
    return n


if __name__ == "__main__":
    main()
