"""Dense TSDF volume fusion + surface point extraction, pure JAX.

Replaces Open3D's ScalableTSDFVolume used by the reference fragment builder
(/root/reference/multiway/make_fragments.py:112-140). A dense voxel grid is
the TPU-friendly formulation at fragment scale (a 4 m cube at 1 cm voxels is
a 400^3 f32 grid; the default below is 0.8 cm over 3.2 m like the reference
config). Each depth-frame integration is one fully-vectorized update:
project all voxel centers, gather depth, update (tsdf, weight) with the
truncated projective SDF running average.

Surface points come from zero crossings of the TSDF along the three axes
(linear interpolation) -- the downstream pipeline consumes fragment *point
clouds*, not meshes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pointdsc_tpu.fusion.camera import PinholeIntrinsics, project_points


@partial(jax.jit, static_argnames=("intr", "dims"))
def _integrate(
    tsdf, weight, origin, voxel_size, sdf_trunc, depth, cam_to_world, intr,
    dims,
):
    d, h_, w_ = dims
    idx = jnp.arange(d * h_ * w_)
    iz = idx % w_
    iy = (idx // w_) % h_
    ix = idx // (w_ * h_)
    centers = (
        jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32) + 0.5
    ) * voxel_size + origin  # [M, 3] world

    world_to_cam = jnp.linalg.inv(cam_to_world)
    cam_pts = centers @ world_to_cam[:3, :3].T + world_to_cam[:3, 3]
    uv, in_front = project_points(cam_pts, intr)
    H, W = depth.shape
    ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    inside = (
        (uv[:, 0] >= 0) & (uv[:, 0] <= W - 1) & (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1)
    )
    depth_val = depth[vi, ui]
    sdf = depth_val - cam_pts[:, 2]
    valid = in_front & inside & (depth_val > 1e-4) & (sdf > -sdf_trunc)
    tsdf_new = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)

    w_old = weight.reshape(-1)
    t_old = tsdf.reshape(-1)
    w_upd = jnp.where(valid, 1.0, 0.0)
    w_new = w_old + w_upd
    t_new = jnp.where(
        valid, (t_old * w_old + tsdf_new) / jnp.maximum(w_new, 1.0), t_old
    )
    return t_new.reshape(dims), w_new.reshape(dims)


@dataclass
class TSDFVolume:
    """Dense TSDF grid. `dims` are (X, Y, Z) voxel counts."""

    origin: np.ndarray
    voxel_size: float = 0.008
    sdf_trunc: float = 0.04
    dims: tuple = (256, 256, 256)
    tsdf: jnp.ndarray = field(default=None)
    weight: jnp.ndarray = field(default=None)

    def __post_init__(self):
        if self.tsdf is None:
            self.tsdf = jnp.ones(self.dims, jnp.float32)
        if self.weight is None:
            self.weight = jnp.zeros(self.dims, jnp.float32)

    def integrate(self, depth: jnp.ndarray, intr: PinholeIntrinsics,
                  cam_to_world: jnp.ndarray):
        self.tsdf, self.weight = _integrate(
            self.tsdf,
            self.weight,
            jnp.asarray(self.origin, jnp.float32),
            jnp.asarray(self.voxel_size, jnp.float32),
            jnp.asarray(self.sdf_trunc, jnp.float32),
            jnp.asarray(depth, jnp.float32),
            jnp.asarray(cam_to_world, jnp.float32),
            intr,
            self.dims,
        )


def extract_surface_points(vol: TSDFVolume, min_weight: float = 1.0) -> np.ndarray:
    """Zero-crossing surface points with linear interpolation along x/y/z."""
    t = np.asarray(vol.tsdf)
    w = np.asarray(vol.weight)
    pts = []
    for axis in range(3):
        t0 = t
        t1 = np.roll(t, -1, axis=axis)
        w0, w1 = w, np.roll(w, -1, axis=axis)
        cross = (t0 * t1 < 0) & (w0 >= min_weight) & (w1 >= min_weight)
        # drop the wrap-around border slice
        sl = [slice(None)] * 3
        sl[axis] = slice(-1, None)
        cross[tuple(sl)] = False
        ix, iy, iz = np.nonzero(cross)
        frac = t0[ix, iy, iz] / (t0[ix, iy, iz] - t1[ix, iy, iz])
        base = np.stack([ix, iy, iz], axis=-1).astype(np.float64) + 0.5
        step = np.zeros_like(base)
        step[:, axis] = frac
        pts.append((base + step) * vol.voxel_size + vol.origin)
    if not pts:
        return np.zeros((0, 3))
    return np.concatenate(pts, axis=0)
