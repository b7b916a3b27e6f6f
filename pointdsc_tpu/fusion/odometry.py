"""Frame-to-frame depth odometry: projective point-to-plane ICP, pure JAX.

Replaces the Open3D RGB-D odometry used by the reference fragment builder
(/root/reference/multiway/make_fragments.py:64-109). Instead of photometric
+ geometric joint optimization we use the geometric term alone --
point-to-plane ICP with *projective* data association (project each source
point into the target depth image; O(N) association instead of O(N^2) NN),
which is the standard KinectFusion-style tracker and fits TPU execution:
every iteration is gathers + one 6x6 normal-equation solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointdsc_tpu.fusion.camera import PinholeIntrinsics, backproject_depth, project_points
from pointdsc_tpu.ops.lie import se3_exp


def depth_normals(depth: jnp.ndarray, intr: PinholeIntrinsics) -> jnp.ndarray:
    """Per-pixel normals from cross products of backprojected image
    gradients. Returns [H, W, 3] (unnormalized entries masked to 0)."""
    pts, valid = backproject_depth(depth, intr)
    h, w = depth.shape
    P = pts.reshape(h, w, 3)
    V = valid.reshape(h, w)
    dx = jnp.roll(P, -1, axis=1) - P
    dy = jnp.roll(P, -1, axis=0) - P
    n = jnp.cross(dy, dx)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-9)
    ok = V & jnp.roll(V, -1, 1) & jnp.roll(V, -1, 0)
    return jnp.where(ok[..., None], n, 0.0)


@partial(jax.jit, static_argnames=("intr", "iters"))
def depth_odometry(
    depth_src: jnp.ndarray,
    depth_tgt: jnp.ndarray,
    intr: PinholeIntrinsics,
    init_trans: jnp.ndarray | None = None,
    iters: int = 20,
    max_depth_diff: float = 0.07,
    stride: int = 2,
):
    """Estimate T with T(src points) ~= tgt points (camera_src -> camera_tgt).

    Returns (trans [4,4], inlier_fraction).
    """
    if init_trans is None:
        init_trans = jnp.eye(4)
    # pin everything to f32 (x64 mode would otherwise mix dtypes in the scan)
    init_trans = jnp.asarray(init_trans, jnp.float32)
    depth_src = jnp.asarray(depth_src, jnp.float32)
    depth_tgt = jnp.asarray(depth_tgt, jnp.float32)

    src_pts, src_valid = backproject_depth(depth_src, intr)
    # subsample for speed (stride^2 fewer residuals)
    h, w = depth_src.shape
    sel = (
        (jnp.arange(h * w) % stride == 0)
        & ((jnp.arange(h * w) // w) % stride == 0)
    )
    src_valid = src_valid & sel

    tgt_pts_img, tgt_valid_flat = backproject_depth(depth_tgt, intr)
    tgt_P = tgt_pts_img.reshape(h, w, 3)
    tgt_V = tgt_valid_flat.reshape(h, w)
    tgt_N = depth_normals(depth_tgt, intr)

    def step(trans, _):
        R, t = trans[:3, :3], trans[:3, 3]
        warped = src_pts @ R.T + t  # [N, 3] in tgt camera frame
        uv, in_front = project_points(warped, intr)
        ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
        inside = (
            (uv[:, 0] >= 0) & (uv[:, 0] <= w - 1)
            & (uv[:, 1] >= 0) & (uv[:, 1] <= h - 1)
        )
        q = tgt_P[vi, ui]  # associated target points
        n = tgt_N[vi, ui]
        ok = (
            src_valid & in_front & inside & tgt_V[vi, ui]
            & (jnp.abs(warped[:, 2] - q[:, 2]) < max_depth_diff)
            & (jnp.sum(n * n, axis=-1) > 0.5)
        )
        wgt = ok.astype(warped.dtype)

        # point-to-plane residual r = n . (p' - q); J wrt twist (w, v):
        # dr/dw = (p' x n), dr/dv = n
        r = jnp.sum(n * (warped - q), axis=-1)
        Jw = jnp.cross(warped, n)
        J = jnp.concatenate([Jw, n], axis=-1)  # [N, 6]
        H = jnp.einsum("ni,nj,n->ij", J, J, wgt) + 1e-6 * jnp.eye(6, dtype=J.dtype)
        b = jnp.einsum("ni,n,n->i", J, r, wgt)
        xi = -jnp.linalg.solve(H, b)
        delta = se3_exp(xi)
        new_trans = delta @ trans
        enough = jnp.sum(wgt) > 100
        return jnp.where(enough, new_trans, trans), jnp.sum(wgt)

    trans, counts = jax.lax.scan(step, init_trans, None, length=iters)
    frac = counts[-1] / jnp.maximum(jnp.sum(src_valid), 1)
    return trans, frac
