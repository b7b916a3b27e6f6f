"""Lie maps, ICP, information matrix, pose graph, ATE."""

import numpy as np
import pytest
import jax.numpy as jnp

from pointdsc_tpu.ops.lie import se3_exp, se3_log, so3_exp, so3_log
from pointdsc_tpu.ops.icp import icp_point_to_point, information_matrix
from pointdsc_tpu.multiway import (
    PoseGraph,
    PoseGraphEdge,
    optimize_pose_graph,
    ate_rmse,
)
from pointdsc_tpu.data import transforms_np as T


class TestLie:
    def test_so3_roundtrip(self, rng):
        # log returns the canonical representative, so keep |w| < pi
        w = rng.normal(size=(20, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, (20, 1))
        R = so3_exp(jnp.asarray(w))
        w2 = np.asarray(so3_log(R))
        np.testing.assert_allclose(w2, w, atol=1e-5)

    def test_so3_small_angle(self):
        w = jnp.asarray([[1e-9, 0.0, 0.0]])
        R = so3_exp(w)
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-7)
        assert np.isfinite(np.asarray(so3_log(R))).all()

    def test_se3_roundtrip(self, rng):
        xi = rng.normal(size=(20, 6))
        w = xi[:, :3]
        xi[:, :3] = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(
            0.01, 3.0, (20, 1)
        )
        Texp = se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3_log(Texp))
        np.testing.assert_allclose(xi2, xi, atol=1e-5)

    def test_se3_exp_is_rigid(self, rng):
        xi = jnp.asarray(rng.normal(size=(5, 6)))
        Texp = np.asarray(se3_exp(xi))
        for Ti in Texp:
            np.testing.assert_allclose(Ti[:3, :3] @ Ti[:3, :3].T, np.eye(3), atol=1e-6)
            np.testing.assert_allclose(Ti[3], [0, 0, 0, 1], atol=1e-7)


class TestICP:
    def test_refines_perturbed_transform(self, rng):
        pts = rng.uniform(-1, 1, (500, 3))
        R = T.rotation_matrix(3, 1.0, rng)
        t = T.translation_matrix(0.3, rng)
        gt = T.integrate_trans(R, t)
        tgt = T.transform(pts, gt)
        # perturb the gt slightly as the initial estimate
        pert = T.integrate_trans(T.rotation_matrix(3, 0.01, rng),
                                 T.translation_matrix(0.02, rng))
        init = pert @ gt
        trans, fitness, rmse = icp_point_to_point(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(tgt, jnp.float32),
            jnp.asarray(init, jnp.float32),
            max_correspondence_distance=0.2,
            max_iters=20,
        )
        np.testing.assert_allclose(np.asarray(trans), gt, atol=5e-3)
        assert float(fitness) > 0.99
        assert float(rmse) < 1e-2

    def test_information_matrix_counts(self, rng):
        pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        info = information_matrix(
            jnp.asarray(pts), jnp.asarray(pts), jnp.eye(4),
            max_correspondence_distance=0.1,
        )
        info = np.asarray(info)
        assert info.shape == (6, 6)
        # all points match themselves -> info[5,5] == N
        assert abs(info[5, 5] - 200) < 1e-3
        np.testing.assert_allclose(info, info.T, atol=1e-3)


class TestPoseGraph:
    def _ring_graph(self, rng, n=8, noise=0.02, bad_edges=0):
        # ground-truth poses along a loop
        gt = [np.eye(4)]
        for i in range(1, n):
            step = T.integrate_trans(
                T.rotation_matrix(3, 0.05, rng), T.translation_matrix(0.5, rng)
            )
            gt.append(gt[-1] @ step)

        def noisy(trans):
            pert = T.integrate_trans(
                T.rotation_matrix(3, noise / 5, rng), T.translation_matrix(noise, rng)
            )
            return pert @ trans

        edges = []
        # odometry chain, slightly noisy measurements
        for i in range(n - 1):
            meas = noisy(np.linalg.inv(gt[i + 1]) @ gt[i])  # src->tgt convention
            edges.append(
                PoseGraphEdge(i, i + 1, np.linalg.inv(meas), np.eye(6), uncertain=False)
            )
        # loop closures
        for (i, j) in [(0, n - 1), (0, n // 2), (1, n // 2 + 1)]:
            meas = np.linalg.inv(gt[j]) @ gt[i]
            edges.append(PoseGraphEdge(i, j, np.linalg.inv(meas), np.eye(6)))
        # corrupted loop closures
        for _ in range(bad_edges):
            i, j = sorted(rng.choice(n, 2, replace=False).tolist())
            bad = T.integrate_trans(
                T.rotation_matrix(3, 1.0, rng), T.translation_matrix(2.0, rng)
            )
            edges.append(PoseGraphEdge(int(i), int(j), bad, np.eye(6)))

        # initial poses: integrate the noisy odometry (drift accumulates)
        init = [np.eye(4)]
        for e in edges[: n - 1]:
            init.append(init[-1] @ e.transformation)
        return gt, PoseGraph(poses=init, edges=edges)

    @pytest.mark.slow
    def test_optimization_reduces_ate(self, rng):
        gt, graph = self._ring_graph(rng, n=8, noise=0.05)
        before = ate_rmse(graph.poses, gt)
        opt = optimize_pose_graph(graph, max_correspondence_distance=0.3)
        after = ate_rmse(opt.poses, gt)
        assert after < before, (before, after)
        assert after < 3.0, f"ATE after optimization {after} cm"

    @pytest.mark.slow
    def test_bad_loop_closures_pruned(self, rng):
        gt, graph = self._ring_graph(rng, n=8, noise=0.03, bad_edges=2)
        n_edges_before = len(graph.edges)
        opt = optimize_pose_graph(graph, max_correspondence_distance=0.3)
        # the corrupted edges must be pruned; good ones survive
        assert len(opt.edges) < n_edges_before
        after = ate_rmse(opt.poses, gt)
        assert after < 5.0, f"ATE {after} cm with bad edges present"


class TestATE:
    def test_identical_trajectories(self, rng):
        poses = [T.integrate_trans(T.rotation_matrix(3, 1.0, rng),
                                   T.translation_matrix(1.0, rng)) for _ in range(5)]
        assert ate_rmse(poses, poses) < 1e-4

    def test_rigidly_displaced(self, rng):
        poses = [T.integrate_trans(T.rotation_matrix(3, 1.0, rng),
                                   T.translation_matrix(1.0, rng)) for _ in range(6)]
        offset = T.integrate_trans(T.rotation_matrix(3, 1.0, rng),
                                   T.translation_matrix(3.0, rng))
        moved = [offset @ p for p in poses]
        # rigid displacement is removed by alignment
        assert ate_rmse(moved, poses) < 1e-3
