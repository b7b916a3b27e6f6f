"""Hybrid photometric+geometric RGB-D odometry (reference
multiway/make_fragments.py:64-109 uses Open3D's hybrid term).

The flat-wall scene is the canonical failure case for geometric-only
tracking: in-plane camera translation is unobservable from depth alone, so
the photometric term must pin it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pointdsc_tpu.fusion.camera import PinholeIntrinsics
from pointdsc_tpu.fusion.odometry import depth_odometry, rgbd_odometry

H, W = 120, 160
INTR = PinholeIntrinsics(fx=100.0, fy=100.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5,
                         width=W, height=H)


def render_wall(cam_x: float, z0: float = 1.5):
    """Textured flat wall at depth z0, camera translated by cam_x along +x.

    Texture = smooth sinusoid mixture (bilinear-friendly). Intensity at a
    pixel depends on the WORLD point it sees, so translating the camera
    shifts the pattern.
    """
    us = np.arange(W) - INTR.cx
    vs = np.arange(H) - INTR.cy
    uu, vv = np.meshgrid(us, vs)
    # world coordinates of the surface point seen by each pixel
    wx = uu / INTR.fx * z0 + cam_x
    wy = vv / INTR.fy * z0
    intensity = 0.5 + 0.25 * np.sin(14.0 * wx) + 0.2 * np.cos(11.0 * wy + 3 * wx)
    depth = np.full((H, W), z0, np.float32)
    return intensity.astype(np.float32), depth


class TestRGBDOdometry:
    def test_flat_wall_in_plane_translation(self):
        """Photometric term recovers in-plane motion; geometric-only cannot."""
        dx = 0.02  # 2 cm along +x (in-plane)
        i0, d0 = render_wall(0.0)
        i1, d1 = render_wall(dx)

        # hybrid: should recover t ~= (-dx, 0, 0) (src cam at x=0 maps into
        # the tgt camera frame at x=dx => points shift by -dx)
        trans, frac = rgbd_odometry(
            jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(i1), jnp.asarray(d1),
            INTR, iters=30, stride=1,
        )
        trans = np.asarray(trans)
        assert float(frac) > 0.5
        np.testing.assert_allclose(trans[:3, :3], np.eye(3), atol=5e-3)
        assert abs(trans[0, 3] - (-dx)) < 0.004, trans[:3, 3]

        # geometric-only on the same pair: the wall gives it nothing; it
        # must NOT recover the in-plane component (stays near identity)
        g_trans, _ = depth_odometry(jnp.asarray(d0), jnp.asarray(d1), INTR)
        g_err = abs(float(np.asarray(g_trans)[0, 3]) - (-dx))
        h_err = abs(trans[0, 3] - (-dx))
        assert h_err < g_err * 0.25, (h_err, g_err)

    def test_identity_pair(self):
        i0, d0 = render_wall(0.0)
        trans, frac = rgbd_odometry(
            jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(i0), jnp.asarray(d0),
            INTR, iters=10,
        )
        np.testing.assert_allclose(np.asarray(trans), np.eye(4), atol=1e-5)
        assert float(frac) > 0.9

    def test_depth_motion_still_tracked(self):
        """Forward (out-of-plane) motion: both objectives observe it; hybrid
        must not be worse than geometric-only."""
        dz = 0.03
        i0, d0 = render_wall(0.0, z0=1.5)
        i1, d1 = render_wall(0.0, z0=1.5 - dz)  # camera moved +z by dz

        trans, _ = rgbd_odometry(
            jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(i1), jnp.asarray(d1),
            INTR, iters=30, stride=1,
        )
        assert abs(float(np.asarray(trans)[2, 3]) - (-dz)) < 0.005
