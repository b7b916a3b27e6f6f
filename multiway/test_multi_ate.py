#!/usr/bin/env python
"""Multiway registration on Augmented ICL-NUIM with ATE evaluation
(parity with /root/reference/multiway/test_multi_ate.py).

Per scene: all fragment pairs are registered (odometry pairs by multi-scale
ICP, loop closures by PointDSC with overlap pruning), assembled into a pose
graph, robustly optimized, optionally ICP-refined and re-optimized, and
scored as ATE RMSE (cm) against the ground-truth fragment trajectory.
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
    parser.add_argument("--root", default="/data/Augmented_ICL-NUIM", type=str)
    parser.add_argument("--descriptor", default="fpfh", type=str)
    parser.add_argument("--num_node", default=20000, type=int)
    parser.add_argument("--use_icp", default=False, type=str2bool)
    parser.add_argument("--fused", default="auto", type=str,
                        choices=("auto", "true", "false"),
                        help="fused-attention kernels: auto = on TPU only")
    parser.add_argument("--save_traj", default=False, type=str2bool,
                        help="write the optimized fragment trajectory to "
                             "logs/<scene>_traj.log (Redwood .log format)")
    parser.add_argument(
        "--scenes",
        default="livingroom1-simulated,livingroom2-simulated,"
        "office1-simulated,office2-simulated",
        type=str,
    )
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.pipeline import pad_to_bucket
    from pointdsc_tpu.data.redwood import RedwoodDataset
    from pointdsc_tpu.models import PointDSC
    from pointdsc_tpu.multiway.ate import ate_rmse
    from pointdsc_tpu.multiway.registration import (
        MultiwayConfig,
        build_pose_graph,
        refine_and_reoptimize,
    )
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

    ates = []
    for scene in args.scenes.split(","):
        print(f"=== Scene {scene} ===")
        dataset = RedwoodDataset(
            root=args.root,
            select_scene=scene,
            descriptor=cfg.descriptor,
            in_dim=cfg.in_dim,
            inlier_threshold=cfg.inlier_threshold,
            num_node=args.num_node,
            use_mutual=True,
        )

        variables = None
        forward = None
        pairwise = {}
        fragment_points = {
            i: dataset._load(i)[0] for i in range(dataset.num_pcds)
        }
        # PointDSC registers every pair; odometry pairs additionally get ICP
        # refinement inside build_pose_graph with this estimate as the init
        # (the reference seeds odometry from per-fragment pose-graph files,
        # test_multi_ate.py:117-125; the model estimate plays that role when
        # those files are absent).
        for idx in range(len(dataset)):
            i, j = dataset.pair_ids(idx)
            sample = dataset[idx]
            padded = pad_to_bucket(sample)
            inputs = (
                jnp.asarray(padded["corr_pos"])[None],
                jnp.asarray(padded["src_keypts"])[None],
                jnp.asarray(padded["tgt_keypts"])[None],
            )
            mask_in = jnp.asarray(padded["mask"])[None]
            if variables is None:
                ckpt = f"snapshot/{args.chosen_snapshot}/models/model_best.pkl"
                if args.chosen_snapshot and os.path.exists(ckpt):
                    variables = load_model_weights(model, ckpt, inputs)
                else:
                    variables = model.init(jax.random.key(0), *inputs)

                fused = (
                    jax.default_backend() == "tpu"
                    if args.fused == "auto"
                    else args.fused == "true"
                )
                regime_probes_left = 3 if fused else 0

            # Kernel-selection guard (models/regime.py): the fused path's
            # offset-softmax kernels are exact only inside a validity
            # regime; imported weights (load_model_weights above) or
            # out-of-distribution fragments can leave it and would degrade
            # SILENTLY toward uniform attention. Probe the first few pairs
            # (slack is pair-dependent) and fall back to the running-max
            # flash kernels on violation (VERDICT r4 item 3: this CLI used
            # to jit model.apply directly, bypassing the Evaluator guard).
            if fused and regime_probes_left > 0:
                from pointdsc_tpu.models.regime import (
                    select_attention_kernels,
                )

                regime_probes_left -= 1
                model, _, flipped = select_attention_kernels(
                    model, variables, *inputs, mask=mask_in,
                    context="multiway",
                )
                if flipped:
                    regime_probes_left = 0
                    forward = None  # re-jit against the flipped model

            if forward is None:
                def make_forward(model, variables, fused):
                    @jax.jit
                    def forward(corr_pos, src, tgt, mask):
                        out = model.apply(
                            variables, corr_pos, src, tgt, mask=mask,
                            testing=True, fused_attention=fused,
                        )
                        return out.final_trans

                    return forward

                forward = make_forward(model, variables, fused)

            trans = np.asarray(forward(*inputs, mask_in))[0]
            pairwise[(i, j)] = trans

        mcfg = MultiwayConfig()
        graph = build_pose_graph(
            dataset.num_pcds, pairwise, fragment_points, mcfg
        )
        if args.use_icp:
            graph = refine_and_reoptimize(graph, fragment_points, mcfg)

        ate = ate_rmse(graph.poses, dataset.gt_trajectory)
        print(f"Scene {scene}: ATE RMSE = {ate:.2f} cm "
              f"({len(graph.edges)} edges kept)")
        if args.save_traj:
            from pointdsc_tpu.eval.redwood_protocol import write_trajectory

            os.makedirs("logs", exist_ok=True)
            write_trajectory(
                os.path.join("logs", f"{scene}_traj.log"), graph.poses
            )
        ates.append(ate)

    print(f"Mean ATE over {len(ates)} scenes: {np.mean(ates):.2f} cm")
    return ates


if __name__ == "__main__":
    main()
