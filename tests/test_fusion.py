"""RGB-D fusion subsystem: synthetic depth rendering -> odometry + TSDF."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pointdsc_tpu.fusion import (
    PinholeIntrinsics,
    TSDFVolume,
    backproject_depth,
    depth_odometry,
    extract_surface_points,
)
from pointdsc_tpu.fusion.camera import project_points
from pointdsc_tpu.data import transforms_np as T

INTR = PinholeIntrinsics(width=160, height=120, fx=130.0, fy=130.0, cx=79.5, cy=59.5)


def render_plane_depth(intr, cam_to_world, plane_z=2.0, bumps=True):
    """Depth of the plane z=plane_z (world) seen from cam pose, with bumpy
    texture so point-to-plane odometry is fully constrained."""
    us, vs = np.meshgrid(np.arange(intr.width), np.arange(intr.height))
    # ray in camera frame
    d = np.stack(
        [(us - intr.cx) / intr.fx, (vs - intr.cy) / intr.fy, np.ones_like(us, float)],
        axis=-1,
    )
    world_to = cam_to_world
    o = world_to[:3, 3]
    Rd = d @ world_to[:3, :3].T
    # intersect z = plane_z (+ gentle height field for conditioning)
    tz = (plane_z - o[2]) / Rd[..., 2]
    pts = o + Rd * tz[..., None]
    if bumps:
        h = 0.08 * np.sin(3.0 * pts[..., 0]) * np.cos(2.0 * pts[..., 1])
        tz = (plane_z + h - o[2]) / Rd[..., 2]
    depth = tz * 1.0  # camera-frame z of the hit = tz * dz(=1)
    depth = np.where((tz > 0.1) & (tz < 6.0), depth, 0.0)
    return depth.astype(np.float32)


class TestCamera:
    def test_backproject_project_roundtrip(self):
        depth = np.full((120, 160), 2.0, np.float32)
        pts, valid = backproject_depth(jnp.asarray(depth), INTR)
        uv, in_front = project_points(pts, INTR)
        us, vs = np.meshgrid(np.arange(160), np.arange(120))
        np.testing.assert_allclose(np.asarray(uv[:, 0]), us.reshape(-1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(uv[:, 1]), vs.reshape(-1), atol=1e-4)
        assert np.asarray(valid).all()


class TestDepthOdometry:
    def test_recovers_small_motion(self, rng):
        pose0 = np.eye(4)
        motion = T.integrate_trans(
            T.rotation_matrix(3, 0.004, rng), np.array([0.02, -0.01, 0.015])
        )
        pose1 = pose0 @ motion  # camera 1 pose in world
        d0 = render_plane_depth(INTR, pose0)
        d1 = render_plane_depth(INTR, pose1)
        trans, frac = depth_odometry(jnp.asarray(d0), jnp.asarray(d1), INTR)
        # ground truth cam0 -> cam1 transform: inv(pose1) @ pose0
        gt = np.linalg.inv(pose1) @ pose0
        assert float(frac) > 0.5
        np.testing.assert_allclose(np.asarray(trans), gt, atol=5e-3)


class TestTSDF:
    def test_plane_reconstruction(self):
        depth = np.full((120, 160), 2.0, np.float32)
        vol = TSDFVolume(
            origin=np.array([-1.0, -1.0, 1.5]),
            voxel_size=0.02,
            sdf_trunc=0.08,
            dims=(100, 100, 50),
        )
        vol.integrate(jnp.asarray(depth), INTR, jnp.eye(4))
        pts = extract_surface_points(vol)
        assert len(pts) > 100
        # surface points concentrate at z ~= 2.0
        assert abs(np.median(pts[:, 2]) - 2.0) < 0.02
        assert np.abs(pts[:, 2] - 2.0).max() < 0.06

    def test_multi_view_fusion_consistent(self, rng):
        vol = TSDFVolume(
            origin=np.array([-1.0, -1.0, 1.5]),
            voxel_size=0.02,
            sdf_trunc=0.08,
            dims=(100, 100, 50),
        )
        for i in range(3):
            pose = T.integrate_trans(np.eye(3), np.array([0.03 * i, 0.0, 0.0]))
            depth = render_plane_depth(INTR, pose, bumps=False)
            vol.integrate(jnp.asarray(depth), INTR, jnp.asarray(pose, np.float32))
        pts = extract_surface_points(vol, min_weight=2.0)
        assert len(pts) > 100
        assert np.abs(pts[:, 2] - 2.0).max() < 0.06
