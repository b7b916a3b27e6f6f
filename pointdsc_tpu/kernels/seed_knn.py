"""Fused exact seed k-NN (Pallas TPU): distance matmul + per-chunk top-k.

The NSM stage needs, for each of the S = ratio*N seed correspondences, the
indices of its k nearest feature-space neighbors among all N correspondences
(reference `cal_seed_trans`, /root/reference/models/PointDSC.py:251-252).
The XLA exact path materializes the [S, N] distance matrix in HBM and sorts
every row (`lax.top_k`-family selection): ~10 ms at S=2048/N=20480, the
single largest cost of the exact-knn variant at Redwood scale.

This kernel never materializes [S, N]: per (seed tile, column chunk) grid
step it computes the similarity tile on the MXU in VMEM (features are
L2-normalized, so nearest-by-distance == largest inner product — a strictly
monotone transform that preserves the exact index set), then extracts the
chunk's top-k by k iterative masked argmax passes over the VMEM tile, and
writes only the [bs, k] chunk winners (values + global indices). The global
exact top-k is a subset of the union of per-chunk top-ks (the same
hierarchy invariant as ops/knn.py::exact_topk), so a cheap second-stage
exact selection over the [S, chunks*k] union finishes the job.

Cost model at S=2048, N=20480, k=40 on v5e: one f32 [S, C]x[C, N] matmul
(~0.3 ms MXU) + k masked-argmax passes over each tile (~k*S*N VPU lane-ops,
~1.5 ms) + ~40 MB of winner writes — ~6x cheaper than the sort-based path,
with bit-identical index sets for distinct scores (under exact ties a
value-equivalent tie subset may differ, same caveat as exact_topk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# winners per (row, chunk) are written in a lane-aligned [bs, KPAD] block;
# k <= KPAD <= 128 keeps the write block a legal (8, 128)-multiple tile
KPAD = 128


def _make_kernel(k, bn):
    def kernel(
        sf_ref,  # (bs, c) f32 seed-feature tile
        cf_ref,  # (c, bn) f32 corr-feature chunk (pre-transposed)
        sid_ref,  # (bs, 128) f32: col 0 = seed's own global index
        mrow_ref,  # (8, bn) f32: row 0 = 0 valid / -1e30 invalid
        vals_ref,  # (bs, KPAD) f32 out: chunk top-k values (desc)
        idx_ref,  # (bs, KPAD) f32 out: global indices of the winners
    ):
        nj = pl.program_id(1)
        f32 = jnp.float32
        scores = jax.lax.dot_general(
            sf_ref[:], cf_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (bs, bn) inner products
        # Mosaic iota must be integer; cast where f32 values are needed
        ii = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        cols = ii.astype(f32) + f32(bn * nj)
        # self-exclusion (the reference drops the k+1 self column) at the
        # -3e38 floor tier so the self column loses even to masked columns
        # (which sit at exactly -1e30) and is never returned
        scores = jnp.where(cols == sid_ref[:, 0:1], f32(-3e38), scores)
        scores = scores + mrow_ref[0:1, :]

        # padding lanes start at -3e38: strictly below any real candidate
        # (masked/self columns score exactly -1e30), so under heavy padding
        # the union stage still returns real column indices — never the
        # fabricated index 0 a -1e30 tie could promote
        vals = jnp.full((scores.shape[0], KPAD), f32(-3e38), f32)
        idxs = jnp.zeros((scores.shape[0], KPAD), f32)
        # lane-mask select instead of dynamic_update_slice: the latter has
        # no Pallas TPU lowering (even with constant offsets); writing
        # winner i into lane i via an iota compare is a pure vector select
        lane = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], KPAD), 1)
        for i in range(k):
            m = jnp.max(scores, axis=-1, keepdims=True)  # (bs, 1)
            am = jnp.argmax(scores, axis=-1)[:, None]  # (bs, 1) int32
            sel = lane == i
            vals = jnp.where(sel, m, vals)
            idxs = jnp.where(sel, am.astype(f32) + f32(bn * nj), idxs)
            # exclude the winner at the -3e38 floor tier: setting it to
            # -1e30 would TIE with still-unselected masked columns and make
            # argmax return the same column forever (duplicate neighbors
            # when fewer than k valid candidates exist)
            hit = ii == am
            scores = jnp.where(hit, f32(-3e38), scores)
        vals_ref[:] = vals
        idx_ref[:] = idxs

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "block_s", "block_n", "interpret")
)
def _seed_knn_single(
    seed_feats, corr_feats_t, seed_ids, mask_row, k,
    block_s=256, block_n=1024, interpret=False,
):
    s, c = seed_feats.shape
    n = corr_feats_t.shape[1]
    bs, bn = min(block_s, s), min(block_n, n)
    while s % bs:
        bs //= 2
    while n % bn:
        bn //= 2
    n_chunks = n // bn
    vals, idxs = pl.pallas_call(
        _make_kernel(k, bn),
        grid=(s // bs, n_chunks),
        in_specs=[
            pl.BlockSpec((bs, c), lambda si, nj: (si, 0)),
            pl.BlockSpec((c, bn), lambda si, nj: (0, nj)),
            pl.BlockSpec((bs, 128), lambda si, nj: (si, 0)),
            pl.BlockSpec((8, bn), lambda si, nj: (0, nj)),
        ],
        out_specs=[
            pl.BlockSpec((bs, KPAD), lambda si, nj: (si, nj)),
            pl.BlockSpec((bs, KPAD), lambda si, nj: (si, nj)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, n_chunks * KPAD), jnp.float32),
            jax.ShapeDtypeStruct((s, n_chunks * KPAD), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(seed_feats, corr_feats_t, seed_ids, mask_row)
    return vals, idxs


def seed_knn_exact(features, seeds, k, mask=None, interpret=None):
    """Exact k nearest feature neighbors of the seed rows — fused.

    Args:
        features: [B, N, C] L2-normalized features (f32).
        seeds:    [B, S] int32 seed indices (each seed excludes itself).
        mask:     [B, N] bool; invalid correspondences never selected.
    Returns:
        [B, S, k] int32 neighbor indices, exactly the top-k by smallest
        feature distance (ties: value-equivalent subset, like exact_topk).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from pointdsc_tpu.ops.knn import exact_topk

    b, n, c = features.shape
    if n >= 1 << 24:
        # winner indices ride through the kernel as f32 (integers are exact
        # below 2^24); pipeline sizes are ~20k, reject rather than round
        raise ValueError(
            f"seed_knn_exact: N={n} exceeds the f32 index carry (2^24)."
        )
    if k > KPAD:
        # the per-chunk winner block is KPAD lanes wide; iterations past it
        # would clamp onto column KPAD-1 and silently drop candidates
        raise ValueError(
            f"seed_knn_exact: k={k} exceeds the kernel's KPAD={KPAD} winner "
            "block; use the XLA exact_topk path for larger k."
        )
    s = seeds.shape[1]
    # pad the seed axis up to the row-tile multiple
    bs = min(256, s)
    s_pad = -(-s // bs) * bs

    def one(f, sd, mrow):
        sf = jnp.take(f, sd, axis=0)  # [S, C]
        sf = jnp.pad(sf, ((0, s_pad - s), (0, 0)))
        sid = jnp.zeros((s_pad, 128), jnp.float32)
        sid = sid.at[:s, 0].set(sd.astype(jnp.float32))
        vals, idxs = _seed_knn_single(
            sf, f.T, sid, mrow, k, block_s=bs, interpret=interpret
        )
        # union of per-chunk winners -> exact second stage. Only the first
        # k of each KPAD-wide block are real; the padding lanes hold -3e38,
        # strictly below every real candidate (masked/self columns carry
        # exactly -1e30), so they can never enter the top-k.
        i2 = exact_topk(vals[:s], k)
        return jnp.take_along_axis(idxs[:s], i2, axis=-1).astype(jnp.int32)

    if mask is None:
        mrow = jnp.zeros((b, 8, n), jnp.float32)
    else:
        mrow = jnp.zeros((b, 8, n), jnp.float32)
        mrow = mrow.at[:, 0, :].set(jnp.where(mask, 0.0, _NEG))
    return jax.vmap(one)(features, seeds, mrow)
