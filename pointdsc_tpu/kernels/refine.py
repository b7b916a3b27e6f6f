"""Fused post-refinement statistics kernel (Pallas TPU).

Each post-refinement iteration (reference PointDSC.py:403-438) needs, from
the current transform: warped distances, inlier weights, and the weighted
Procrustes sufficient statistics. As separate XLA ops that is ~12 small
kernels per iteration, serialized inside the `while_loop` — pure dispatch
latency at eval time. This kernel computes the whole iteration's reduction
in ONE pass over the points:

    G = sum_i [w_i*s_i; w_i; inl_i] (x) [t_i; 1]        (8x8 Gram, MXU)

where w_i = inl_i / (1 + (d_i/thr)^2) are the Geman-McClure weights of the
current iterate. From G the caller reads H (weighted covariance), the
centroids, sum(w) and the integer inlier count — everything the Horn
Procrustes update and the early-freeze test need.

Numerical note: the Gram form computes the covariance as
sum(w s t^T) - wsum * cs ct^T (uncentered second moments). The wrapper
centers both clouds on their means before packing, so the cancellation
error is bounded by the cloud extent, not the absolute coordinates —
required for KITTI-scale (~100 m) inputs in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointdsc_tpu.ops.procrustes import rotation_from_covariance
from pointdsc_tpu.ops.se3 import integrate_trans


def pack_refine_strip(src, tgt, mask=None):
    """[8, N] f32 strip: rows 0-2 src xyz, row 3 mask, rows 4-6 tgt xyz."""
    n = src.shape[0]
    if mask is None:
        m = jnp.ones((1, n), jnp.float32)
    else:
        m = mask[None].astype(jnp.float32)
    return jnp.concatenate(
        [
            src.T.astype(jnp.float32),
            m,
            tgt.T.astype(jnp.float32),
            jnp.zeros((1, n), jnp.float32),
        ],
        axis=0,
    )


def _refine_gram_kernel(params_ref, g_ref, out_ref, acc):
    """params (1, 16): rows of R | t | thr. g (8, T). out/acc (8, 128)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    g = g_ref[:]
    sx, sy, sz = g[0:1, :], g[1:2, :], g[2:3, :]
    m = g[3:4, :]
    tx, ty, tz = g[4:5, :], g[5:6, :], g[6:7, :]

    p = [params_ref[0, j] for j in range(13)]  # SMEM allows scalar loads only
    wx = p[0] * sx + p[1] * sy + p[2] * sz + p[9]
    wy = p[3] * sx + p[4] * sy + p[5] * sz + p[10]
    wz = p[6] * sx + p[7] * sy + p[8] * sz + p[11]
    thr = p[12]
    dx, dy, dz = wx - tx, wy - ty, wz - tz
    d2 = dx * dx + dy * dy + dz * dz
    inl = jnp.where(d2 < thr * thr, 1.0, 0.0) * m
    w = inl / (1.0 + d2 / (thr * thr))

    ones = jnp.ones_like(sx)
    zero = jnp.zeros_like(sx)
    P = jnp.concatenate(
        [w * sx, w * sy, w * sz, w, inl, zero, zero, zero], axis=0
    )  # (8, T)
    Q = jnp.concatenate([tx, ty, tz, ones, zero, zero, zero, zero], axis=0)
    gram = jax.lax.dot_general(
        P, Q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (8, 8)
    acc[:, 0:8] += gram

    @pl.when(i == pl.num_programs(0) - 1)
    def _finalize():
        out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _refine_gram_single(strip, params, block=2048, interpret=False):
    n = strip.shape[1]
    block = min(block, n)
    while n % block != 0:  # buckets are multiples of 256
        block //= 2
    out = pl.pallas_call(
        _refine_gram_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, block), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(params, strip)
    return out[:, :8]


def refine_gram(strip, trans, thr, interpret=False):
    """Weighted-Procrustes sufficient statistics of one refinement iterate.

    Args:
        strip: [8, N] from pack_refine_strip (centered coordinates).
        trans: [4, 4] current transform IN THE CENTERED FRAME.
        thr:   inlier threshold.
    Returns:
        G [8, 8]: G[:3,:3]=sum(w s t^T), G[:3,3]=sum(w s), G[3,:3]=sum(w t),
        G[3,3]=sum(w), G[4,3]=inlier count.
    """
    params = jnp.concatenate(
        [
            trans[:3, :3].reshape(-1),
            trans[:3, 3],
            jnp.asarray([thr], trans.dtype),
            jnp.zeros((3,), trans.dtype),
        ]
    ).astype(jnp.float32)[None]
    return _refine_gram_single(strip, params, interpret=interpret)


def _procrustes_from_gram(G, eps=1e-6):
    """Horn fit from the 8x8 sufficient statistics (centered frame)."""
    wsum = G[3, 3] + eps
    cs = G[:3, 3] / wsum
    ct = G[3, :3] / wsum
    H = G[:3, :3] - wsum * jnp.outer(cs, ct)
    R = rotation_from_covariance(H[None])[0]
    t = ct - R @ cs
    return integrate_trans(R[None], t[None, :, None])[0]


def fused_post_refinement(
    initial_trans,
    src_keypts,
    tgt_keypts,
    mask,
    thr: float,
    max_iters: int,
    interpret: bool | None = None,
):
    """Drop-in fused replacement for PointDSC.post_refinement (testing path).

    Same math as the jnp version (warp -> threshold -> Geman-McClure
    re-fit, per-sample freeze when the inlier count stops changing), but
    each iteration's point-loop is one Pallas reduction.

    Args:
        initial_trans [B, 4, 4], src/tgt [B, N, 3], mask [B, N].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # masked mean: zero-padded entries must not drag the anchor toward the
    # origin, or far-from-origin clouds (KITTI) lose the cancellation bound
    # the Gram-form covariance depends on
    m = mask[..., None].astype(src_keypts.dtype)
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)  # [B, 1]
    anchor_s = jnp.sum(src_keypts * m, axis=1) / count  # [B, 3]
    anchor_t = jnp.sum(tgt_keypts * m, axis=1) / count

    def one(trans0, src, tgt, m, a_s, a_t):
        strip = pack_refine_strip(src - a_s, tgt - a_t, m)

        def to_centered(T):
            R = T[:3, :3]
            t = T[:3, 3] + R @ a_s - a_t
            return integrate_trans(R[None], t[None, :, None])[0]

        def to_original(T):
            R = T[:3, :3]
            t = T[:3, 3] - R @ a_s + a_t
            return integrate_trans(R[None], t[None, :, None])[0]

        def body(state):
            trans, prev_num, active, it = state
            G = refine_gram(strip, trans, thr, interpret=interpret)
            num = G[4, 3].astype(jnp.int32)
            changed = jnp.abs(num - prev_num) >= 1
            new_trans = _procrustes_from_gram(G)
            still = active & changed
            trans = jnp.where(still, new_trans, trans)
            return trans, num, still, it + 1

        def cond(state):
            _, _, active, it = state
            return active & (it < max_iters)

        state = (
            to_centered(trans0),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(True),
            jnp.asarray(0, jnp.int32),
        )
        trans, _, _, _ = jax.lax.while_loop(cond, body, state)
        return to_original(trans)

    return jax.vmap(one)(
        initial_trans, src_keypts, tgt_keypts, mask, anchor_s, anchor_t
    )
