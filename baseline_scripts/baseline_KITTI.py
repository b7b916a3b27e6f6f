#!/usr/bin/env python
"""Classical-baseline benchmark on KITTI (parity with
/root/reference/baseline_scripts/baseline_KITTI.py).

Same methods as the 3DMatch baseline CLI (SM / RANSAC / GCRANSAC / LS /
PMC), with the reference's outdoor protocol: inlier tau = 0.6 m, success =
RE < 5 deg and TE < 60 cm, num_node = 15000 correspondences
(baseline_KITTI.py:26-27,103) and the KITTI-specific SM top_ratio = 0.05
(baseline_KITTI.py:50). Output is the shared 12-column stats protocol.

Usage: python baseline_scripts/baseline_KITTI.py --method RANSAC --root ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baseline_scripts._runner import run_baseline, str2bool


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--method", default="RANSAC",
        choices=["SM", "RANSAC", "GCRANSAC", "LS", "PMC"]
    )
    parser.add_argument("--root", default="/data/KITTI", type=str)
    parser.add_argument("--descriptor", default="fcgf", choices=["fcgf", "fpfh"])
    parser.add_argument("--split", default="test", type=str)
    parser.add_argument("--num_node", default=15000, type=int)
    parser.add_argument("--inlier_threshold", default=0.60, type=float)
    parser.add_argument("--max_iteration", default=4096, type=int)
    parser.add_argument(
        "--gc_minimizer", default="icm", choices=["icm", "exact"],
        help="GCRANSAC labeling: device ICM sweeps or the exact native "
        "s-t mincut (native/maxflow.cpp, matches pygcransac's graph cut)",
    )
    parser.add_argument("--re_thre", default=5.0, type=float)
    parser.add_argument("--te_thre", default=60.0, type=float)
    parser.add_argument("--save_npy", default=False, type=str2bool)
    args = parser.parse_args(argv)

    from pointdsc_tpu.data.kitti import KITTIDataset
    from pointdsc_tpu.utils.seed import set_seed

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
    return run_baseline(
        dataset, ["KITTI"], lambda i: 0, args,
        sm_top_ratio=0.05,  # reference baseline_KITTI.py:50
        save_tag="-kitti",
    )


if __name__ == "__main__":
    main()
