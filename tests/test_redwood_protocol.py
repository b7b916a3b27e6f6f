"""Redwood-protocol scorer verification.

Tests the math of eval/redwood_protocol.py against independent
implementations (reference semantics: /root/reference/evaluation/
benchmark_utils_predator.py:56-230):

- rotation_to_quaternion vs the Bar-Itzhack eigenvector method (what
  nibabel's mat2quat uses — a completely different algorithm than our
  Shepperd branch conversion), across all four Shepperd branches.
- transformation_error on planted perturbations with closed-form error.
- evaluate_registration precision/recall/flags on a constructed gt set
  exercising the non-consecutive-pair rule.
"""

import numpy as np
import pytest


def quat_to_rot(q):
    """Unit quaternion (w, x, y, z) -> rotation matrix (independent of the
    code under test)."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def mat2quat_bar_itzhack(R):
    """Bar-Itzhack method: the quaternion is the leading eigenvector of the
    symmetric 4x4 K matrix — this is nibabel.quaternions.mat2quat's
    algorithm (including its exact `... = M.flat` row-major unpacking, so
    the sign convention matches the reference's nq.mat2quat bit for bit),
    serving as an independent oracle for our Shepperd branches."""
    Qxx, Qyx, Qzx, Qxy, Qyy, Qzy, Qxz, Qyz, Qzz = np.asarray(R).flat
    K = (
        np.array(
            [
                [Qxx - Qyy - Qzz, 0, 0, 0],
                [Qyx + Qxy, Qyy - Qxx - Qzz, 0, 0],
                [Qzx + Qxz, Qzy + Qyz, Qzz - Qxx - Qyy, 0],
                [Qyz - Qzy, Qzx - Qxz, Qxy - Qyx, Qxx + Qyy + Qzz],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


def rot_about(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    q = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
    return quat_to_rot(q)


class TestRotationToQuaternion:
    def test_round_trip_random(self, rng):
        from pointdsc_tpu.eval.redwood_protocol import rotation_to_quaternion

        for _ in range(50):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = quat_to_rot(q)
            np.testing.assert_allclose(rotation_to_quaternion(R), q, atol=1e-10)

    @pytest.mark.parametrize(
        "R",
        [
            np.eye(3),  # trace > 0 branch
            np.diag([1.0, -1.0, -1.0]),  # 180 deg about x: R00 dominant
            np.diag([-1.0, 1.0, -1.0]),  # 180 deg about y: R11 dominant
            np.diag([-1.0, -1.0, 1.0]),  # 180 deg about z: R22 dominant
        ],
    )
    def test_degenerate_branches_match_oracle(self, R):
        from pointdsc_tpu.eval.redwood_protocol import rotation_to_quaternion

        got = rotation_to_quaternion(R)
        want = mat2quat_bar_itzhack(R)
        # at 180 deg the quaternion sign of the vector part is ambiguous
        # (w = 0); compare up to global sign
        err = min(np.linalg.norm(got - want), np.linalg.norm(got + want))
        assert err < 1e-10

    def test_matches_bar_itzhack_on_random_rotations(self, rng):
        from pointdsc_tpu.eval.redwood_protocol import rotation_to_quaternion

        for _ in range(50):
            A = rng.normal(size=(3, 3))
            Q, _ = np.linalg.qr(A)
            if np.linalg.det(Q) < 0:
                Q[:, 0] = -Q[:, 0]
            np.testing.assert_allclose(
                rotation_to_quaternion(Q), mat2quat_bar_itzhack(Q), atol=1e-8
            )


class TestTransformationError:
    def test_identity_residual_is_zero(self):
        from pointdsc_tpu.eval.redwood_protocol import transformation_error

        info = np.eye(6) * 123.0
        assert transformation_error(np.eye(4), info) == 0.0

    def test_pure_translation_closed_form(self, rng):
        from pointdsc_tpu.eval.redwood_protocol import transformation_error

        # with info = c*I the weighted error is exactly |t|^2 + |q_vec|^2
        # (the /info[0,0] normalization cancels c)
        t = rng.normal(size=3)
        T = np.eye(4)
        T[:3, 3] = t
        got = transformation_error(T, np.eye(6) * 7.0)
        np.testing.assert_allclose(got, np.dot(t, t), rtol=1e-12)

    def test_pure_rotation_closed_form(self):
        from pointdsc_tpu.eval.redwood_protocol import transformation_error

        theta = 0.2
        T = np.eye(4)
        T[:3, :3] = rot_about([0, 0, 1], theta)
        got = transformation_error(T, np.eye(6))
        np.testing.assert_allclose(got, np.sin(theta / 2) ** 2, rtol=1e-10)

    def test_info_weighting_and_normalization(self, rng):
        """Against an independent numpy port of the reference formula
        (benchmark_utils_predator.py:56-75) with the Bar-Itzhack oracle."""
        from pointdsc_tpu.eval.redwood_protocol import transformation_error

        for _ in range(20):
            A = rng.normal(size=(3, 3))
            Q, _ = np.linalg.qr(A)
            if np.linalg.det(Q) < 0:
                Q[:, 0] = -Q[:, 0]
            T = np.eye(4)
            T[:3, :3] = Q
            T[:3, 3] = rng.normal(size=3)
            B = rng.normal(size=(6, 6))
            info = B @ B.T + np.eye(6)  # SPD, info[0,0] > 0

            q = mat2quat_bar_itzhack(Q)
            er = np.concatenate([T[:3, 3], q[1:]])
            want = float(er @ info @ er / info[0, 0])
            np.testing.assert_allclose(
                transformation_error(T, info), want, rtol=1e-8
            )

    def test_scale_invariance_in_info(self, rng):
        from pointdsc_tpu.eval.redwood_protocol import transformation_error

        T = np.eye(4)
        T[:3, :3] = rot_about([1, 2, 3], 0.1)
        T[:3, 3] = [0.05, -0.02, 0.01]
        B = rng.normal(size=(6, 6))
        info = B @ B.T + np.eye(6)
        a = transformation_error(T, info)
        b = transformation_error(T, info * 1e4)
        np.testing.assert_allclose(a, b, rtol=1e-12)


class TestEvaluateRegistration:
    def _make_scene(self):
        """5 fragments; gt pairs: (0,1) consecutive (excluded), (0,2), (1,3),
        (0,4) non-consecutive. gt transform = known rigid motions."""
        rng = np.random.default_rng(3)
        gt_pairs = np.array([[0, 1, 5], [0, 2, 5], [1, 3, 5], [0, 4, 5]])
        gt = []
        for _ in range(len(gt_pairs)):
            T = np.eye(4)
            T[:3, :3] = rot_about(rng.normal(size=3), rng.uniform(0.1, 1.0))
            T[:3, 3] = rng.normal(size=3)
            gt.append(T)
        gt = np.stack(gt)
        info = np.stack([np.eye(6) * 100.0 for _ in range(len(gt_pairs))])
        return gt_pairs, gt, info

    def test_perfect_results(self):
        from pointdsc_tpu.eval.redwood_protocol import evaluate_registration

        gt_pairs, gt, info = self._make_scene()
        # submit exactly the three non-consecutive gt transforms
        result_pairs = gt_pairs[1:]
        result = gt[1:]
        p, r, flags = evaluate_registration(
            5, result, result_pairs, gt_pairs, gt, info
        )
        assert (p, r) == (1.0, 1.0)
        assert flags == [0, 0, 0]

    def test_mixed_good_bad_and_not_in_gt(self):
        from pointdsc_tpu.eval.redwood_protocol import evaluate_registration

        gt_pairs, gt, info = self._make_scene()
        bad = gt[2].copy()
        bad[:3, 3] += 5.0  # way past the 0.2 m threshold
        result_pairs = np.array([[0, 2, 5], [1, 3, 5], [2, 4, 5]])
        result = np.stack([gt[1], bad, np.eye(4)])  # (2,4) not in gt
        p, r, flags = evaluate_registration(
            5, result, result_pairs, gt_pairs, gt, info
        )
        # 1 good of 2 gt-matched results; 3 testable gt pairs
        np.testing.assert_allclose(p, 0.5)
        np.testing.assert_allclose(r, 1.0 / 3.0)
        assert flags == [0, 1, 2]

    def test_consecutive_pairs_excluded(self):
        from pointdsc_tpu.eval.redwood_protocol import evaluate_registration

        gt_pairs, gt, info = self._make_scene()
        # submitting only the consecutive (0,1) pair: it is not testable,
        # so it counts neither toward precision nor recall
        p, r, flags = evaluate_registration(
            5, gt[:1], gt_pairs[:1], gt_pairs, gt, info
        )
        assert (p, r) == (0.0, 0.0)
        assert flags == [2]

    def test_threshold_boundary(self):
        from pointdsc_tpu.eval.redwood_protocol import evaluate_registration

        gt_pairs, gt, info = self._make_scene()
        # perturb (0,2) by a translation of exactly err2 = 0.2 m along x:
        # with info = 100*I the weighted error is exactly 0.2^2 -> success
        # (<=); 0.201 m -> failure
        for delta, expect_flag in [(0.2, 0), (0.201, 1)]:
            res = gt[1].copy()
            res = gt[1] @ _translate(delta)
            p, r, flags = evaluate_registration(
                5, res[None], gt_pairs[1:2], gt_pairs, gt, info
            )
            assert flags == [expect_flag], delta


def _translate(dx):
    T = np.eye(4)
    T[0, 3] = dx
    return T


class TestTrajectoryWriter:
    def test_round_trip(self, tmp_path, rng):
        from pointdsc_tpu.eval.redwood_protocol import (
            read_trajectory,
            write_trajectory,
        )

        poses = []
        for _ in range(3):
            A = rng.normal(size=(3, 3))
            Q, _ = np.linalg.qr(A)
            T = np.eye(4)
            T[:3, :3] = Q
            T[:3, 3] = rng.normal(size=3)
            poses.append(T)
        path = str(tmp_path / "traj.log")
        write_trajectory(path, poses)
        keys, traj = read_trajectory(path)
        assert traj.shape == (3, 4, 4)
        np.testing.assert_allclose(traj, np.stack(poses), atol=1e-10)
        assert keys[1][2] == "2"

    def test_space_separated_format(self, tmp_path):
        """External Redwood tooling splits on single spaces; the writer must
        emit the reference's space-separated .log format (multiway/
        trajectory.py::write_trajectory), not tabs."""
        from pointdsc_tpu.eval.redwood_protocol import write_trajectory

        path = str(tmp_path / "traj.log")
        write_trajectory(path, [np.eye(4)])
        text = open(path).read()
        assert "\t" not in text
        lines = text.strip().split("\n")
        assert lines[0] == "0 0 1"
        assert [float(v) for v in lines[1].split(" ")] == [1.0, 0.0, 0.0, 0.0]
