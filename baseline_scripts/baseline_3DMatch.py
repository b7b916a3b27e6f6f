#!/usr/bin/env python
"""Classical-baseline benchmark on 3DMatch (parity with
/root/reference/baseline_scripts/baseline_3DMatch.py).

Methods: SM (spectral matching), RANSAC (on-device vmapped hypothesis
sweep), GCRANSAC (graph-cut RANSAC: spatially-coherent inlier labeling +
local optimization, on device), LS (least-squares on gt inliers), PMC
(native exact max-clique).
Same 12-column stats protocol as the model evaluation, so methods are
directly comparable. The evaluation loop is shared with the KITTI baseline
CLI (baseline_scripts/_runner.py).

Usage: python baseline_scripts/baseline_3DMatch.py --method SM --root ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baseline_scripts._runner import run_baseline, str2bool


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--method", default="SM",
        choices=["SM", "RANSAC", "GCRANSAC", "LS", "PMC"]
    )
    parser.add_argument("--root", default="/data/3DMatch", type=str)
    parser.add_argument("--descriptor", default="fcgf", choices=["fcgf", "fpfh"])
    parser.add_argument("--num_node", default=2048, type=int)
    parser.add_argument("--inlier_threshold", default=0.10, type=float)
    parser.add_argument("--max_iteration", default=4096, type=int)
    parser.add_argument(
        "--gc_minimizer", default="icm", choices=["icm", "exact"],
        help="GCRANSAC labeling: device ICM sweeps or the exact native "
        "s-t mincut (native/maxflow.cpp, matches pygcransac's graph cut)",
    )
    parser.add_argument("--re_thre", default=15.0, type=float)
    parser.add_argument("--te_thre", default=30.0, type=float)
    parser.add_argument("--save_npy", default=False, type=str2bool)
    args = parser.parse_args(argv)

    from pointdsc_tpu.data.threedmatch import ThreeDMatchTest
    from pointdsc_tpu.utils.seed import set_seed

    set_seed(51)
    dataset = ThreeDMatchTest(
        root=args.root,
        descriptor=args.descriptor,
        inlier_threshold=args.inlier_threshold,
        num_node=args.num_node,
        use_mutual=False,
    )
    return run_baseline(
        dataset, dataset.scene_list, dataset.scene_of, args,
        sm_top_ratio=0.1,  # reference baseline_3DMatch.py SM default
    )


if __name__ == "__main__":
    main()
