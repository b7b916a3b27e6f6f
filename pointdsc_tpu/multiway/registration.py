"""Multiway registration: fragments -> pose graph -> globally consistent poses.

Rebuilds /root/reference/multiway/test_multi_ate.py:54-227 without Open3D:
  * odometry pairs (j = i + 1): multi-scale ICP (ours, ops/icp.py) from an
    initial guess (identity or a provided init);
  * loop-closure pairs: PointDSC transform, pruned when the
    information-matrix overlap info[5,5]/min(N_s, N_t) < min_overlap or the
    transform degenerates to identity (test_multi_ate.py:147-149);
  * robust pose-graph optimization (multiway/pose_graph.py);
  * optional second pass: ICP-refine every surviving edge and re-optimize
    (test_multi_ate.py:183-227).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from pointdsc_tpu.descriptors.fpfh import voxel_downsample
from pointdsc_tpu.multiway.pose_graph import PoseGraph, PoseGraphEdge, optimize_pose_graph
from pointdsc_tpu.ops.icp import icp_point_to_point, information_matrix


def multi_scale_icp(
    src_pts: np.ndarray,
    tgt_pts: np.ndarray,
    init_trans: np.ndarray,
    voxel_sizes=(0.05, 0.025, 0.0125),
    max_iters=(50, 30, 14),
    distance_threshold: float = 0.05 * 1.4,
):
    """Coarse-to-fine ICP on voxel-downsampled clouds
    (test_multi_ate.py:54-74). Returns (trans, information 6x6)."""
    trans = np.asarray(init_trans, np.float32)
    info = np.eye(6, dtype=np.float32)
    for stage, (v, it) in enumerate(zip(voxel_sizes, max_iters)):
        src_d = voxel_downsample(np.asarray(src_pts, np.float64), v)
        tgt_d = voxel_downsample(np.asarray(tgt_pts, np.float64), v)
        trans_j, fitness, _ = icp_point_to_point(
            jnp.asarray(src_d),
            jnp.asarray(tgt_d),
            jnp.asarray(trans),
            max_correspondence_distance=distance_threshold,
            max_iters=it,
        )
        trans = np.asarray(trans_j)
        if stage == len(voxel_sizes) - 1:
            info = np.asarray(
                information_matrix(
                    jnp.asarray(src_d),
                    jnp.asarray(tgt_d),
                    jnp.asarray(trans),
                    max_correspondence_distance=v * 1.4,
                )
            )
    return trans, info


@dataclass
class MultiwayConfig:
    min_overlap: float = 0.30
    max_correspondence_distance: float = 0.07
    edge_prune_threshold: float = 0.25
    preference_loop_closure: float = 20.0
    icp_distance: float = 0.05 * 1.4
    use_second_pass_icp: bool = False


def build_pose_graph(
    num_fragments: int,
    pairwise_results: dict,
    fragment_points: dict,
    cfg: MultiwayConfig = MultiwayConfig(),
) -> PoseGraph:
    """Assemble the pose graph from pairwise registrations.

    Args:
        num_fragments: number of fragment nodes.
        pairwise_results: {(i, j): trans [4,4]} with trans mapping fragment i
            points into fragment j's frame (the PointDSC/ICP output), for
            all evaluated pairs.
        fragment_points: {i: [N_i, 3] } representative points per fragment
            (used for information matrices and odometry ICP).

    Returns an optimized PoseGraph whose node poses map fragment -> world.
    """
    # node poses accumulate odometry: pose_j = pose_i @ inv(T_ij) with our
    # convention trans: src -> tgt frame => relative pose of node j in i's
    # frame is inv(T_ij)
    poses = [np.eye(4)]
    edges = []
    for i in range(num_fragments - 1):
        j = i + 1
        trans = pairwise_results.get((i, j))
        if trans is None:
            trans = np.eye(4)
        trans, info = multi_scale_icp(
            fragment_points[i], fragment_points[j], trans,
            distance_threshold=cfg.icp_distance,
        )
        poses.append(poses[-1] @ np.linalg.inv(trans))
        edges.append(
            PoseGraphEdge(i, j, np.linalg.inv(trans), info, uncertain=False)
        )

    for (i, j), trans in sorted(pairwise_results.items()):
        if j == i + 1:
            continue
        info = np.asarray(
            information_matrix(
                jnp.asarray(fragment_points[i], jnp.float32),
                jnp.asarray(fragment_points[j], jnp.float32),
                jnp.asarray(trans, jnp.float32),
                max_correspondence_distance=cfg.icp_distance,
            )
        )
        overlap = info[5, 5] / min(
            len(fragment_points[i]), len(fragment_points[j])
        )
        is_identity = abs(np.trace(trans) - 4.0) < 1e-9
        if overlap < cfg.min_overlap or is_identity:
            continue  # too little overlap: drop the loop closure
        edges.append(
            PoseGraphEdge(i, j, np.linalg.inv(trans), info, uncertain=True)
        )

    graph = PoseGraph(poses=poses, edges=edges)
    return optimize_pose_graph(
        graph,
        max_correspondence_distance=cfg.max_correspondence_distance,
        edge_prune_threshold=cfg.edge_prune_threshold,
        preference_loop_closure=cfg.preference_loop_closure,
    )


def refine_and_reoptimize(
    graph: PoseGraph,
    fragment_points: dict,
    cfg: MultiwayConfig = MultiwayConfig(),
) -> PoseGraph:
    """Second pass (test_multi_ate.py:183-227): ICP-refine every edge from
    the optimized relative poses, rebuild informations, re-optimize."""
    new_edges = []
    for e in graph.edges:
        # current relative estimate from optimized node poses
        rel = np.linalg.inv(np.asarray(graph.poses[e.source])) @ np.asarray(
            graph.poses[e.target]
        )
        init = np.linalg.inv(rel)  # src -> tgt transform guess
        trans, info = multi_scale_icp(
            fragment_points[e.source], fragment_points[e.target], init,
            distance_threshold=cfg.icp_distance,
        )
        new_edges.append(
            PoseGraphEdge(
                e.source, e.target, np.linalg.inv(trans), info, uncertain=e.uncertain
            )
        )
    graph = PoseGraph(poses=list(graph.poses), edges=new_edges)
    return optimize_pose_graph(
        graph,
        max_correspondence_distance=cfg.max_correspondence_distance,
        edge_prune_threshold=cfg.edge_prune_threshold,
        preference_loop_closure=cfg.preference_loop_closure,
    )
