"""Pose-graph optimization: robust Gauss-Newton over SE(3), pure JAX.

Replaces Open3D's `global_optimization` (LM + line-process edge pruning)
used by the reference multiway pipeline (/root/reference/multiway/
optimize_posegraph.py:33-42, test_multi_ate.py:164-178). The method follows
Choi-Zhou-Koltun 2015 ("Robust Reconstruction of Indoor Scenes"), which is
also what Open3D implements:

  minimize  sum_e  l_e * r_e^T  Info_e  r_e  +  mu * (sqrt(l_e) - 1)^2

where r_e = log(inv(T_meas) inv(T_i) T_j) and l_e in (0, 1] is a closed-form
line-process weight for *uncertain* (loop-closure) edges:
l_e = (mu / (mu + r^T Info r))^2. Odometry edges keep l = 1.

The inner Gauss-Newton solve jits: the residual/Jacobian assembly is
vectorized over edges and the normal equations are one dense [6n, 6n] solve
(n fragments ~ 50-60, so the matrix is tiny by TPU standards).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pointdsc_tpu.ops.lie import se3_exp, se3_log


@dataclass
class PoseGraphEdge:
    source: int
    target: int
    transformation: np.ndarray  # [4, 4] measured T_st: source -> target frame
    information: np.ndarray  # [6, 6]
    uncertain: bool = True


@dataclass
class PoseGraph:
    poses: list  # list of [4, 4] node poses (node -> world)
    edges: list = field(default_factory=list)


def _edge_residual(poses, i, j, meas_inv):
    """r = log( meas_inv * inv(T_i) * T_j )  (all [4,4] / [6])."""
    Ti_inv = jnp.linalg.inv(poses[i])
    return se3_log(meas_inv @ Ti_inv @ poses[j])


@partial(jax.jit, static_argnames=("num_nodes",))
def _gn_iteration(poses, src_idx, tgt_idx, meas_inv, infos, weights, num_nodes,
                  damping):
    """One damped GN step. poses [n,4,4]; edge arrays stacked over edges.

    The edge Jacobian is block-sparse (each residual touches only nodes i
    and j), so we differentiate the per-edge residual wrt its TWO 6-dof
    increments ([E,6,6] blocks) and scatter-assemble the normal equations —
    O(E) memory instead of the dense [E,6,n,6] jacrev of every node.
    """

    def edge_r(xi_i, xi_j, Ti, Tj, mi):
        Ti2 = se3_exp(xi_i) @ Ti
        Tj2 = se3_exp(xi_j) @ Tj
        return se3_log(mi @ jnp.linalg.inv(Ti2) @ Tj2)

    E = src_idx.shape[0]
    zero6 = jnp.zeros((E, 6), poses.dtype)
    Ti, Tj = poses[src_idx], poses[tgt_idx]
    r0 = jax.vmap(edge_r)(zero6, zero6, Ti, Tj, meas_inv)  # [E, 6]
    Ji, Jj = jax.vmap(jax.jacrev(edge_r, argnums=(0, 1)))(
        zero6, zero6, Ti, Tj, meas_inv
    )  # each [E, 6, 6]

    W = weights[:, None, None] * infos  # [E, 6, 6]
    Wr = jnp.einsum("eij,ej->ei", W, r0)
    bi = jnp.einsum("eri,er->ei", Ji, Wr)
    bj = jnp.einsum("eri,er->ei", Jj, Wr)
    Hii = jnp.einsum("eri,erj->eij", Ji, jnp.einsum("ers,esj->erj", W, Ji))
    Hij = jnp.einsum("eri,erj->eij", Ji, jnp.einsum("ers,esj->erj", W, Jj))
    Hjj = jnp.einsum("eri,erj->eij", Jj, jnp.einsum("ers,esj->erj", W, Jj))

    Hb = jnp.zeros((num_nodes, 6, num_nodes, 6), poses.dtype)
    Hb = Hb.at[src_idx, :, src_idx, :].add(Hii)
    Hb = Hb.at[src_idx, :, tgt_idx, :].add(Hij)
    Hb = Hb.at[tgt_idx, :, src_idx, :].add(jnp.swapaxes(Hij, -1, -2))
    Hb = Hb.at[tgt_idx, :, tgt_idx, :].add(Hjj)
    b = (
        jnp.zeros((num_nodes, 6), poses.dtype)
        .at[src_idx].add(bi)
        .at[tgt_idx].add(bj)
        .reshape(num_nodes * 6)
    )
    H = Hb.reshape(num_nodes * 6, num_nodes * 6)
    # gauge freedom: anchor node 0 by a strong prior
    anchor = jnp.zeros((num_nodes * 6,)).at[:6].set(1e6)
    H = H + jnp.diag(anchor) + damping * jnp.eye(num_nodes * 6)
    delta = -jnp.linalg.solve(H, b)
    new_poses = se3_exp(delta.reshape(num_nodes, 6)) @ poses
    cost = jnp.sum(jnp.einsum("ei,eij,ej->e", r0, W, r0))
    return new_poses, cost


def _line_process_weights(poses, src_idx, tgt_idx, meas_inv, infos, uncertain, mu):
    r = jax.vmap(se3_log)(
        meas_inv @ jnp.linalg.inv(poses[src_idx]) @ poses[tgt_idx]
    )
    quad = jnp.einsum("ei,eij,ej->e", r, infos, r)
    l = (mu / (mu + quad)) ** 2
    return jnp.where(uncertain, l, 1.0)


def optimize_pose_graph(
    graph: PoseGraph,
    max_correspondence_distance: float = 0.07,
    edge_prune_threshold: float = 0.25,
    preference_loop_closure: float = 20.0,
    gn_iters: int = 30,
    outer_iters: int = 5,
    damping: float = 1e-6,
) -> PoseGraph:
    """Robust pose-graph optimization.

    Mirrors the Open3D option set used by the reference
    (optimize_posegraph.py:33-42): max_correspondence_distance drives the
    line-process mu (Choi et al. use mu = d_max^2), edges whose final line
    process weight drops below `edge_prune_threshold` are pruned.
    """
    n = len(graph.poses)
    poses = jnp.asarray(np.stack(graph.poses)).astype(jnp.float64 if False else jnp.float32)
    if not graph.edges:
        return graph

    src_idx = jnp.asarray([e.source for e in graph.edges])
    tgt_idx = jnp.asarray([e.target for e in graph.edges])
    meas_inv = jnp.asarray(
        np.stack([np.linalg.inv(e.transformation) for e in graph.edges])
    ).astype(poses.dtype)
    infos = jnp.asarray(np.stack([e.information for e in graph.edges])).astype(
        poses.dtype
    )
    # normalize information magnitude so mu is on a comparable scale
    infos = infos / jnp.maximum(infos[:, 5, 5][:, None, None], 1.0)
    uncertain = jnp.asarray([e.uncertain for e in graph.edges])
    mu = jnp.asarray(preference_loop_closure * max_correspondence_distance**2,
                     poses.dtype)

    weights = jnp.ones((len(graph.edges),), poses.dtype)
    for _ in range(outer_iters):
        for _ in range(gn_iters // outer_iters):
            poses, _ = _gn_iteration(
                poses, src_idx, tgt_idx, meas_inv, infos, weights, n, damping
            )
        weights = _line_process_weights(
            poses, src_idx, tgt_idx, meas_inv, infos, uncertain, mu
        )

    weights_np = np.asarray(weights)
    kept = [
        e
        for e, w in zip(graph.edges, weights_np)
        if (not e.uncertain) or w >= edge_prune_threshold
    ]
    return PoseGraph(
        poses=[np.asarray(p) for p in poses],
        edges=kept,
    )
