"""Pinhole camera model: backprojection / projection for depth images."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class PinholeIntrinsics:
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float

    @classmethod
    def primesense_default(cls) -> "PinholeIntrinsics":
        """The PrimeSense/Redwood default used by the reference fragment
        builder (multiway/initialize_config.py)."""
        return cls(640, 480, 525.0, 525.0, 319.5, 239.5)


def backproject_depth(depth: jnp.ndarray, intr: PinholeIntrinsics,
                      depth_trunc: float = 4.0):
    """Depth image [H, W] (meters) -> points [H*W, 3] + validity [H*W].

    Invalid pixels (0 or beyond depth_trunc) are masked, not dropped
    (static shapes)."""
    h, w = depth.shape
    us = jnp.arange(w, dtype=depth.dtype)
    vs = jnp.arange(h, dtype=depth.dtype)
    uu, vv = jnp.meshgrid(us, vs)
    z = depth
    valid = (z > 1e-4) & (z < depth_trunc)
    x = (uu - intr.cx) / intr.fx * z
    y = (vv - intr.cy) / intr.fy * z
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return pts, valid.reshape(-1)


def project_points(pts: jnp.ndarray, intr: PinholeIntrinsics):
    """Points [N, 3] (camera frame) -> pixel coords [N, 2] + in-front mask."""
    z = pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    u = pts[..., 0] / safe_z * intr.fx + intr.cx
    v = pts[..., 1] / safe_z * intr.fy + intr.cy
    in_front = z > 1e-4
    return jnp.stack([u, v], axis=-1), in_front
