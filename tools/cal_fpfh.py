#!/usr/bin/env python
"""Batch FPFH descriptor preparation (reference misc/cal_fpfh.py:7-106).

Walks a dataset root and writes `<name>_fpfh.npz` files (keys: points, xyz,
feature) exactly where the datasets expect them, so the whole pipeline can
bootstrap from raw fragments with the in-repo JAX FPFH (no Open3D):

  3dmatch       {root}/threedmatch/*.npz ('pcd' key)
                -> {root}/threedmatch_feat/<name>_fpfh.npz
  3dmatch_test  {root}/fragments/<scene>/*.ply  -> _fpfh.npz next to the ply
  redwood       {root}/<scene>/fragments/*.ply  -> _fpfh.npz next to the ply

Usage:
  python tools/cal_fpfh.py --job 3dmatch --root /data/3DMatch
  python tools/cal_fpfh.py --job 3dmatch_test --root /data/3DMatch --scenes all
  python tools/cal_fpfh.py --job redwood --root /data/Augmented_ICL-NUIM
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
from pointdsc_tpu.descriptors.fpfh import extract_fpfh


def _process_cloud(points, out_path, voxel_size, verbose=True):
    if points.shape[0] == 0:
        print(f"{out_path}: empty cloud, skipped")
        return
    xyz, feature = extract_fpfh(points, voxel_size=voxel_size)
    np.savez_compressed(
        out_path,
        points=np.asarray(points, np.float32),
        xyz=np.asarray(xyz, np.float32),
        feature=np.asarray(feature, np.float32),
    )
    if verbose:
        print(out_path, feature.shape)


def process_3dmatch(root, voxel_size=0.05, verbose=True):
    """Training fragments: {root}/threedmatch/*.npz with a 'pcd' key
    (reference misc/cal_fpfh.py:7-37)."""
    src_dir = os.path.join(root, "threedmatch")
    out_dir = os.path.join(root, "threedmatch_feat")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for path in sorted(glob.glob(os.path.join(src_dir, "*.npz"))):
        data = np.load(path)
        if "pcd" not in data:
            continue
        name = os.path.basename(path).replace(".npz", "_fpfh.npz")
        _process_cloud(data["pcd"], os.path.join(out_dir, name), voxel_size, verbose)
        n += 1
    return n


def process_3dmatch_test(root, voxel_size=0.05, scenes=None, verbose=True):
    """Test fragments: {root}/fragments/<scene>/*.ply
    (reference misc/cal_fpfh.py:39-76)."""
    scenes = scenes or TEST_SCENES
    n = 0
    for scene in scenes:
        for path in sorted(
            glob.glob(os.path.join(root, "fragments", scene, "*.ply"))
        ):
            out = path.replace(".ply", "_fpfh.npz")
            _process_cloud(read_ply_xyz(path), out, voxel_size, verbose)
            n += 1
    return n


def process_redwood(root, voxel_size=0.05, scenes=None, verbose=True):
    """Redwood fragments: {root}/<scene>/fragments/*.ply
    (reference misc/cal_fpfh.py:78-106)."""
    scenes = scenes or REDWOOD_SCENES
    n = 0
    for scene in scenes:
        for path in sorted(
            glob.glob(os.path.join(root, scene, "fragments", "*.ply"))
        ):
            out = path.replace(".ply", "_fpfh.npz")
            _process_cloud(read_ply_xyz(path), out, voxel_size, verbose)
            n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--job", required=True,
                    choices=["3dmatch", "3dmatch_test", "redwood"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--voxel_size", type=float, default=0.05)
    ap.add_argument("--scenes", type=str, default="all",
                    help="comma-separated scene list, or 'all'")
    args = ap.parse_args(argv)

    scenes = None if args.scenes == "all" else args.scenes.split(",")
    if args.job == "3dmatch":
        n = process_3dmatch(args.root, args.voxel_size)
    elif args.job == "3dmatch_test":
        n = process_3dmatch_test(args.root, args.voxel_size, scenes)
    else:
        n = process_redwood(args.root, args.voxel_size, scenes)
    print(f"wrote FPFH features for {n} fragments")
    return n


if __name__ == "__main__":
    main()
