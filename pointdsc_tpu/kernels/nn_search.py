"""Tiled nearest-neighbor search (Pallas TPU).

The ICP inner loop and the registration information matrix (ops/icp.py)
find, for every query point, its nearest neighbor in a base cloud. The jnp
form materializes the [N, M] distance matrix per call — ~100 MB at eval
sizes, times 20 ICP iterations. This kernel keeps a running (min d2, argmin)
per query row and streams base tiles through VMEM: nothing [N, M]-shaped
ever exists.

Per (qi, kj) tile: d2 = |q|^2 + |b|^2 - 2 q.b (one K=3 MXU pass), tile-min
and tile-argmin along the base axis, then a running-min merge in scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def pack_points(pts, mask=None, bias_invalid=False):
    """[8, N] f32 strip: rows 0-2 xyz, row 3 |p|^2 (+1e30 when masked and
    bias_invalid, so masked base points never win the min)."""
    n = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)[None].astype(jnp.float32)
    if mask is not None and bias_invalid:
        sq = jnp.where(mask[None], sq, _BIG)
    return jnp.concatenate(
        [pts.T.astype(jnp.float32), sq, jnp.zeros((4, n), jnp.float32)], axis=0
    )


def _nn_kernel(q_ref, b_ref, d2_ref, idx_ref, dmin_scr, imin_scr):
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _init():
        dmin_scr[:] = jnp.full_like(dmin_scr, _BIG)
        imin_scr[:] = jnp.zeros_like(imin_scr)

    f32 = jnp.float32
    gq = q_ref[:]
    gb = b_ref[:]
    inner = jax.lax.dot_general(
        gq[0:3, :], gb[0:3, :], (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (TQ, TK)
    d2 = gq[3:4, :].T + gb[3:4, :] - 2.0 * inner

    tk = d2.shape[1]
    tmin = jnp.min(d2, axis=1, keepdims=True)  # (TQ, 1)
    targ = jnp.argmin(d2, axis=1)[:, None].astype(jnp.float32)  # (TQ, 1)
    targ = targ + jnp.float32(tk) * kj  # global base index

    better = tmin < dmin_scr[:, 0:1]
    dmin_scr[:, 0:1] = jnp.where(better, tmin, dmin_scr[:, 0:1])
    imin_scr[:, 0:1] = jnp.where(better, targ, imin_scr[:, 0:1])

    @pl.when(kj == pl.num_programs(1) - 1)
    def _fin():
        d2_ref[:] = dmin_scr[:]
        idx_ref[:] = imin_scr[:]


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _nn_single(qs, bs, block_q=1024, block_k=2048, interpret=False):
    nq, m = qs.shape[1], bs.shape[1]
    bq, bk = min(block_q, nq), min(block_k, m)
    while nq % bq != 0:
        bq //= 2
    while m % bk != 0:
        bk //= 2
    d2, idx = pl.pallas_call(
        _nn_kernel,
        grid=(nq // bq, m // bk),
        in_specs=[
            pl.BlockSpec((8, bq), lambda qi, kj: (0, qi)),
            pl.BlockSpec((8, bk), lambda qi, kj: (0, kj)),
        ],
        out_specs=[
            pl.BlockSpec((bq, 128), lambda qi, kj: (qi, 0)),
            pl.BlockSpec((bq, 128), lambda qi, kj: (qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qs, bs)
    return d2[:, 0], idx[:, 0].astype(jnp.int32)


def nearest_neighbors(query, base, base_mask=None, interpret=None):
    """For each query point: (squared distance, index) of its nearest base
    point. query [N, 3], base [M, 3], base_mask [M] bool (masked base
    points never selected). Exact — matches argmin over the full distance
    matrix — for base clouds up to 2^24 points (the running argmin is
    carried in f32 inside the kernel, which represents integers exactly
    only below 2^24; larger clouds are rejected rather than silently
    returning a rounded neighbor index).
    """
    if base.shape[0] >= 1 << 24:
        raise ValueError(
            f"nearest_neighbors: base cloud has {base.shape[0]} points; the "
            "kernel's f32 index carry is exact only below 2^24. Split the "
            "base cloud or use a jnp argmin fallback."
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qs = pack_points(query)
    bs = pack_points(base, base_mask, bias_invalid=True)
    return _nn_single(qs, bs, interpret=interpret)
