"""Fused hypothesis-scoring kernel (Pallas TPU).

Hypothesis selection (reference PointDSC.py:325-335) counts, for every
seed transform, how many correspondences it maps within the inlier
threshold. The jnp form materializes pred [S, N, 3] and L2 [S, N] in HBM
(~30 MB at S=512, N=5120). This kernel tiles seeds x points and keeps
everything in VMEM:

    pred_i[s, n] = R_s[i, :] @ x_n + t_s[i]      (three K=4 MXU passes)
    d2[s, n]     = sum_i (pred_i - y_i[n])^2
    count[s]    += sum_n (d2 < thr^2) * mask[n]

Only the [S] inlier counts leave the kernel; the best seed's per-point
labels are recomputed outside for that one transform (O(N)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_scoring_points(src, tgt, mask=None):
    """[8, N] f32 strip: rows 0-2 src xyz, row 3 ones, rows 4-6 tgt xyz,
    row 7 mask."""
    n = src.shape[0]
    if mask is None:
        m = jnp.ones((1, n), jnp.float32)
    else:
        m = mask[None].astype(jnp.float32)
    return jnp.concatenate(
        [
            src.T.astype(jnp.float32),
            jnp.ones((1, n), jnp.float32),
            tgt.T.astype(jnp.float32),
            m,
        ],
        axis=0,
    )


def pack_scoring_trans(trans):
    """Seed transforms [S, 4, 4] -> [S, 16] rows of [R | t] per output axis:
    cols 0-3 = (R[0,:], t[0]), 4-7 = (R[1,:], t[1]), 8-11 = (R[2,:], t[2])."""
    R = trans[:, :3, :3]
    t = trans[:, :3, 3]
    rows = [jnp.concatenate([R[:, i, :], t[:, i : i + 1]], axis=-1) for i in range(3)]
    out = jnp.concatenate(rows + [jnp.zeros_like(rows[0])], axis=-1)
    return out.astype(jnp.float32)  # [S, 16]


def _scoring_kernel(thr_ref, tr_ref, pts_ref, out_ref, acc):
    nj = pl.program_id(1)

    @pl.when(nj == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    thr = thr_ref[0, 0]
    tr = tr_ref[:]  # (TS, 16)
    g = pts_ref[:]  # (8, TN)
    xh = g[0:4, :]  # homogeneous src (x, y, z, 1)
    ty = g[4:7, :]
    m = g[7:8, :]

    f32 = jnp.float32
    preds = []
    for i in range(3):
        preds.append(
            jax.lax.dot_general(
                tr[:, 4 * i : 4 * i + 4], xh,
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
        )  # (TS, TN)
    d2 = (
        (preds[0] - ty[0:1, :]) ** 2
        + (preds[1] - ty[1:2, :]) ** 2
        + (preds[2] - ty[2:3, :]) ** 2
    )
    inl = jnp.where(d2 < thr * thr, 1.0, 0.0) * m
    acc[:, 0:1] += jnp.sum(inl, axis=-1, keepdims=True)

    @pl.when(nj == pl.num_programs(1) - 1)
    def _fin():
        out_ref[:] = acc[:]


def _largest_lane_divisor(n, cap):
    """Largest multiple of 128 that divides n, capped: halving from the cap
    misses divisors like 2560 | 5120 and leaves a shallow many-chunk
    pipeline whose per-step work cannot hide the grid overheads."""
    for bn in range(min(cap, n), 127, -128):
        if n % bn == 0:
            return bn
    return min(cap, n)


@functools.partial(jax.jit, static_argnames=("block_s", "block_n", "interpret"))
def _scoring_single(tr, pts, thr, block_s=512, block_n=8192, interpret=False):
    s = tr.shape[0]
    n = pts.shape[1]
    bs_ = min(block_s, s)
    while s % bs_ != 0:
        bs_ //= 2
    # the per-point tile is an [8, bn] strip (tiny in VMEM), so take the
    # biggest legal chunk: fewer grid steps, deeper per-step work
    bn = _largest_lane_divisor(n, block_n)
    thr_arr = jnp.asarray(thr, jnp.float32).reshape(1, 1)
    kw = {}
    if not interpret:
        # seed tiles are independent; only the point axis carries the
        # running count
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    out = pl.pallas_call(
        _scoring_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(s // bs_, n // bn),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((bs_, 16), lambda si, nj: (si, 0)),
                pl.BlockSpec((8, bn), lambda si, nj: (0, nj)),
            ],
            out_specs=pl.BlockSpec((bs_, 128), lambda si, nj: (si, 0)),
            scratch_shapes=[pltpu.VMEM((bs_, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
        **kw,
        interpret=interpret,
    )(thr_arr, tr, pts)
    return out[:, 0]


def seed_inlier_counts(
    seed_trans, src_keypts, tgt_keypts, thr, mask=None, interpret=None
):
    """Inlier count of every seed transform over all correspondences.

    Args:
        seed_trans: [B, S, 4, 4]; src/tgt: [B, N, 3]; mask: [B, N].
    Returns: [B, S] float32 counts.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    s_orig = seed_trans.shape[1]
    # pad the seed axis to a tile-friendly multiple (identity transforms;
    # their counts are sliced off) — S = ratio*N is not always 8/512-divisible
    pad = (-s_orig) % 256
    if pad:
        eye = jnp.broadcast_to(
            jnp.eye(4, dtype=seed_trans.dtype),
            (seed_trans.shape[0], pad, 4, 4),
        )
        seed_trans = jnp.concatenate([seed_trans, eye], axis=1)

    def one(tr, s, t, m):
        pts = pack_scoring_points(s, t, m)
        return _scoring_single(
            pack_scoring_trans(tr), pts, thr, interpret=interpret
        )[:s_orig]

    if mask is None:
        mask = jnp.ones(src_keypts.shape[:2], bool)
    return jax.vmap(one)(seed_trans, src_keypts, tgt_keypts, mask)
