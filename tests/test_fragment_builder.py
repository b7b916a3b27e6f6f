"""build_fragment end-to-end: synthetic depth sequence -> fused point cloud."""

import numpy as np
import pytest

from pointdsc_tpu.fusion.fragments import build_fragment
from pointdsc_tpu.data import transforms_np as T
from tests.test_fusion import INTR, render_plane_depth


@pytest.mark.slow
def test_build_fragment_from_depth_sequence(rng):
    # camera slides sideways viewing the bumpy plane at z=2
    poses = []
    depths = []
    for i in range(4):
        pose = T.integrate_trans(np.eye(3), np.array([0.02 * i, 0.0, 0.0]))
        poses.append(pose)
        depths.append(render_plane_depth(INTR, pose))

    points, est_poses = build_fragment(
        depths, intr=INTR, voxel_size=0.02, sdf_trunc=0.08,
        keyframe_every=2, grid_dims=(96, 96, 64),
    )
    assert len(points) > 200
    # surface points near the bumpy plane around z ~ 2 (+-bump 0.08 + tol)
    assert np.abs(points[:, 2] - 2.0).max() < 0.2
    # recovered odometry close to gt relative motion
    for i, (est, gt) in enumerate(zip(est_poses, poses)):
        np.testing.assert_allclose(est[:3, 3], gt[:3, 3], atol=0.01)
