"""Redwood trajectory .log writer round-trip."""

import numpy as np

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
