"""Frame-to-frame RGB-D / depth odometry, pure JAX.

Replaces the Open3D RGB-D odometry used by the reference fragment builder
(/root/reference/multiway/make_fragments.py:64-109):

  * `depth_odometry` — geometric-only projective point-to-plane ICP
    (KinectFusion-style tracker): project each source point into the target
    depth image (O(N) association), gathers + one 6x6 normal-equation solve
    per iteration.
  * `rgbd_odometry` — the hybrid photometric + geometric objective of the
    reference's `RGBDOdometryJacobianFromHybridTerm` (Park et al. 2017,
    Steinbrucker intensity term): sigma * r_plane^2 + (1 - sigma) * r_I^2
    minimized jointly over the same twist, with bilinearly sampled target
    intensity and image gradients. The photometric term pins the in-plane
    degrees of freedom that pure geometry cannot observe on flat/low-relief
    scenes (walls, floors).
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


def _bilinear(img: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear sample img [H, W] at uv [N, 2]; returns (values, inside)."""
    h, w = img.shape
    u, v = uv[:, 0], uv[:, 1]
    inside = (u >= 0) & (u <= w - 1.0) & (v >= 0) & (v <= h - 1.0)
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    du, dv = u - u0, v - v0
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    val = (
        i00 * (1 - du) * (1 - dv)
        + i01 * du * (1 - dv)
        + i10 * (1 - du) * dv
        + i11 * du * dv
    )
    return val, inside


def image_gradients(img: jnp.ndarray):
    """Central-difference gradients (gx, gy) of an [H, W] image, in
    intensity-per-pixel units (borders zeroed)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    gx = gx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    gy = gy.at[0, :].set(0.0).at[-1, :].set(0.0)
    return gx, gy


@partial(jax.jit, static_argnames=("intr", "iters"))
def rgbd_odometry(
    intensity_src: jnp.ndarray,
    depth_src: jnp.ndarray,
    intensity_tgt: jnp.ndarray,
    depth_tgt: jnp.ndarray,
    intr: PinholeIntrinsics,
    init_trans: jnp.ndarray | None = None,
    iters: int = 20,
    max_depth_diff: float = 0.07,
    stride: int = 2,
    sigma: float = 0.968,
):
    """Hybrid photometric + geometric odometry (camera_src -> camera_tgt).

    Args:
        intensity_*: [H, W] grayscale in [0, 1].
        sigma: geometric-term weight; (1 - sigma) weighs the squared
            intensity residual (Open3D/Park default 0.968).

    Returns (trans [4, 4], inlier_fraction).
    """
    if init_trans is None:
        init_trans = jnp.eye(4)
    init_trans = jnp.asarray(init_trans, jnp.float32)
    depth_src = jnp.asarray(depth_src, jnp.float32)
    depth_tgt = jnp.asarray(depth_tgt, jnp.float32)
    i_src = jnp.asarray(intensity_src, jnp.float32)
    i_tgt = jnp.asarray(intensity_tgt, jnp.float32)

    h, w = depth_src.shape
    src_pts, src_valid = backproject_depth(depth_src, intr)
    sel = (
        (jnp.arange(h * w) % stride == 0)
        & ((jnp.arange(h * w) // w) % stride == 0)
    )
    src_valid = src_valid & sel
    src_I = i_src.reshape(-1)  # intensity at each source pixel

    tgt_pts_img, tgt_valid_flat = backproject_depth(depth_tgt, intr)
    tgt_P = tgt_pts_img.reshape(h, w, 3)
    tgt_V = tgt_valid_flat.reshape(h, w)
    tgt_N = depth_normals(depth_tgt, intr)
    gx, gy = image_gradients(i_tgt)

    w_geo = jnp.float32(sigma)
    w_pho = jnp.float32(1.0 - sigma)

    def step(trans, _):
        R, t = trans[:3, :3], trans[:3, 3]
        warped = src_pts @ R.T + t
        uv, in_front = project_points(warped, intr)
        ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
        q = tgt_P[vi, ui]
        n = tgt_N[vi, ui]
        I_t, inside = _bilinear(i_tgt, uv)
        gxv, _ = _bilinear(gx, uv)
        gyv, _ = _bilinear(gy, uv)

        ok = (
            src_valid & in_front & inside & tgt_V[vi, ui]
            & (jnp.abs(warped[:, 2] - q[:, 2]) < max_depth_diff)
        )
        ok_geo = ok & (jnp.sum(n * n, axis=-1) > 0.5)
        wg = ok_geo.astype(jnp.float32) * w_geo
        wp = ok.astype(jnp.float32) * w_pho

        # geometric point-to-plane rows
        r_g = jnp.sum(n * (warped - q), axis=-1)
        J_g = jnp.concatenate([jnp.cross(warped, n), n], axis=-1)  # [N, 6]

        # photometric rows: r = I_tgt(pi(p')) - I_src;
        # dI/dxi = [gx gy] . dpi/dp' . [ -[p']x | I ]
        x, y = warped[:, 0], warped[:, 1]
        z = jnp.maximum(warped[:, 2], 1e-6)
        du_dp = jnp.stack(
            [intr.fx / z, jnp.zeros_like(z), -intr.fx * x / (z * z)], axis=-1
        )
        dv_dp = jnp.stack(
            [jnp.zeros_like(z), intr.fy / z, -intr.fy * y / (z * z)], axis=-1
        )
        gI = gxv[:, None] * du_dp + gyv[:, None] * dv_dp  # [N, 3] = dI/dp'
        # dr/dw_k = gI . (e_k x p') = (p' x gI)_k (same triple-product
        # identity as the geometric term's p' x n row)
        Jw_p = jnp.cross(warped, gI)
        r_p = I_t - src_I

        # robust-ish weighting: Huber on photometric residuals
        hub = 0.03
        wp_r = wp / (1.0 + (jnp.abs(r_p) / hub))

        J_p = jnp.concatenate([Jw_p, gI], axis=-1)  # [N, 6]

        H = (
            jnp.einsum("ni,nj,n->ij", J_g, J_g, wg)
            + jnp.einsum("ni,nj,n->ij", J_p, J_p, wp_r)
            + 1e-6 * jnp.eye(6, dtype=jnp.float32)
        )
        b = jnp.einsum("ni,n,n->i", J_g, r_g, wg) + jnp.einsum(
            "ni,n,n->i", J_p, r_p, wp_r
        )
        xi = -jnp.linalg.solve(H, b)
        delta = se3_exp(xi)
        new_trans = delta @ trans
        enough = jnp.sum(ok) > 100
        return jnp.where(enough, new_trans, trans), jnp.sum(ok)

    trans, counts = jax.lax.scan(step, init_trans, None, length=iters)
    frac = counts[-1] / jnp.maximum(jnp.sum(src_valid), 1)
    return trans, frac
