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
writes only the chunk winners (values + global indices). The global exact
top-k is a subset of the union of per-chunk top-ks (the same hierarchy
invariant as ops/knn.py::exact_topk), so a cheap second-stage exact
selection over the [S, chunks*k] union finishes the job.

Layout (round-4 rewrite): the score tile is TRANSPOSED — candidates on the
sublane axis, seeds on the lane axis. The k-loop's max/argmax then reduce
over the SUBLANE axis (vreg-to-vreg ops, no cross-lane shuffle trees: a
lane-axis reduction pays a ~log2(128)-step shuffle tail per vreg row,
which dominated the round-3 kernel at ~3x the elementwise cost), and each
winner lands in output ROW i as one static (1, bs) store instead of a
(bs, 128) lane-select. Measured ~2.3x faster at S=512/N=5120 with the
identical index contract.

Cost model at S=2048, N=20480, k=40 on v5e: one f32 [N, C]x[C, S] matmul
(~0.3 ms MXU) + k masked-argmax sublane passes over each tile + winner
writes — ~10x cheaper than the sort-based path, with bit-identical index
sets for distinct scores (under exact ties a value-equivalent tie subset
may differ, same caveat as exact_topk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _make_kernel(k, kp, bn):
    def kernel(
        cf_ref,  # (bn, c) f32 corr-feature chunk (natural layout)
        sft_ref,  # (c, bs) f32 seed features, transposed
        sid_ref,  # (8, bs) f32: row 0 = seed's own global index
        mcol_ref,  # (bn, 128) f32: col 0 = 0 valid / -1e30 invalid
        vals_ref,  # (kp, bs) f32 out: chunk top-k values (desc, rows 0..k-1)
        idx_ref,  # (kp, bs) f32 out: global indices of the winners
    ):
        nj = pl.program_id(1)
        f32 = jnp.float32
        scores = jax.lax.dot_general(
            cf_ref[:], sft_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (bn, bs): candidate rows x seed lanes
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        gcols = rows.astype(f32) + f32(bn * nj)
        # mask bias first (invalid candidates sit at exactly -1e30), then
        # the self column at the -3e38 floor tier so the seed's own row
        # loses even to masked candidates and is never returned
        scores = scores + mcol_ref[:, 0:1]
        scores = jnp.where(gcols == sid_ref[0:1, :], f32(-3e38), scores)

        for i in range(k):
            m = jnp.max(scores, axis=0)  # (bs,) sublane-axis reduce
            am = jnp.argmax(scores, axis=0)  # (bs,) int32
            vals_ref[i, :] = m
            idx_ref[i, :] = am.astype(f32) + f32(bn * nj)
            # exclude the winner at the -3e38 floor tier: -1e30 would TIE
            # with still-unselected masked candidates and duplicate them
            # when fewer than k valid candidates exist
            scores = jnp.where(rows == am[None, :], f32(-3e38), scores)
        for i in range(k, kp):  # sublane padding rows: strictly below real
            vals_ref[i, :] = jnp.full((scores.shape[1],), f32(-3e38), f32)
            idx_ref[i, :] = jnp.zeros((scores.shape[1],), f32)

    return kernel


def _make_union_kernel(k, kp):
    def kernel(
        vals_ref,  # (u, bs) f32: per-chunk winner values (union, transposed)
        idxs_ref,  # (u, bs) f32: their global candidate indices
        out_ref,  # (kp, bs) f32: global top-k indices (desc by value)
    ):
        f32 = jnp.float32
        scores = vals_ref[:]
        payload = idxs_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        for i in range(k):
            am = jnp.argmax(scores, axis=0)  # (bs,) sublane-axis reduce
            sel = rows == am[None, :]
            # one-hot extraction: per-lane dynamic row reads don't vectorize
            # on TPU, but a masked sublane sum does (payload indices are
            # exact integers < 2^24, so the f32 sum is exact)
            out_ref[i, :] = jnp.sum(jnp.where(sel, payload, f32(0.0)), axis=0)
            scores = jnp.where(sel, f32(-3e38), scores)
        for i in range(k, kp):
            out_ref[i, :] = jnp.zeros((scores.shape[1],), f32)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _union_select_single(vals, idxs, k, interpret=False):
    """Global exact top-k over the per-chunk winner union, staying in the
    kernel's transposed (candidates x seeds) layout.

    Replaces the round-4 XLA second stage (exact_topk over [S, U] +
    take_along_axis), which cost ~1.1 ms at S=2048/U=400 (sort-based
    selection + two layout transposes); the union tile is tiny (U x 512
    lanes fits VMEM whole), so k one-hot argmax passes cost ~0.1 ms.
    Ties: argmax picks the lowest union row = chunk-major order, a
    value-equivalent subset like exact_topk (same caveat as the chunk
    kernel)."""
    u, s = vals.shape
    bs = min(512, s)
    while s % bs:
        bs //= 2
    kp = -(-k // 8) * 8
    out = pl.pallas_call(
        _make_union_kernel(k, kp),
        grid=(s // bs,),
        in_specs=[
            pl.BlockSpec((u, bs), lambda si: (0, si)),
            pl.BlockSpec((u, bs), lambda si: (0, si)),
        ],
        out_specs=pl.BlockSpec((kp, bs), lambda si: (0, si)),
        out_shape=jax.ShapeDtypeStruct((kp, s), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(vals, idxs)
    return out


@functools.partial(
    jax.jit, static_argnames=("k", "block_s", "block_n", "interpret")
)
def _seed_knn_single(
    corr_feats, seed_feats_t, seed_ids, mask_col, k,
    block_s=512, block_n=2048, interpret=False,
):
    # block_n swept on v5e at S=2048/N=20480 (round 4): bn=2048 runs the
    # k-loop 2.25 ms vs 3.15 for bn=1024 (fewer chunks amortize the
    # 40 winner stores and halve the union width); bn=4096 fails to
    # compile. N not divisible by 2048 (e.g. the n5k flagship) halves
    # back to 1024 below, unchanged from round 3.
    n, c = corr_feats.shape
    s = seed_feats_t.shape[1]
    bs, bn = min(block_s, s), min(block_n, n)
    while s % bs:
        bs //= 2
    while n % bn:
        bn //= 2
    n_chunks = n // bn
    kp = -(-k // 8) * 8  # winner rows padded to a legal sublane multiple
    vals, idxs = pl.pallas_call(
        _make_kernel(k, kp, bn),
        grid=(s // bs, n_chunks),
        in_specs=[
            pl.BlockSpec((bn, c), lambda si, nj: (nj, 0)),
            pl.BlockSpec((c, bs), lambda si, nj: (0, si)),
            pl.BlockSpec((8, bs), lambda si, nj: (0, si)),
            pl.BlockSpec((bn, 128), lambda si, nj: (nj, 0)),
        ],
        out_specs=[
            pl.BlockSpec((kp, bs), lambda si, nj: (nj, si)),
            pl.BlockSpec((kp, bs), lambda si, nj: (nj, si)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * kp, s), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * kp, s), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(corr_feats, seed_feats_t, seed_ids, mask_col)
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
    b, n, c = features.shape
    if n >= 1 << 24:
        # winner indices ride through the kernel as f32 (integers are exact
        # below 2^24); pipeline sizes are ~20k, reject rather than round
        raise ValueError(
            f"seed_knn_exact: N={n} exceeds the f32 index carry (2^24)."
        )
    s = seeds.shape[1]
    # pad the seed axis up to the lane-tile multiple; the lane block must
    # both divide s_pad and stay a multiple of 128
    s_pad = -(-s // 128) * 128
    bs = min(512, s_pad)
    while s_pad % bs:
        bs -= 128

    def one(f, sd, mcol):
        sf = jnp.take(f, sd, axis=0)  # [S, C]
        sf = jnp.pad(sf, ((0, s_pad - s), (0, 0)))
        sid = jnp.zeros((8, s_pad), jnp.float32)
        sid = sid.at[0, :s].set(sd.astype(jnp.float32))
        vals, idxs = _seed_knn_single(
            f, sf.T, sid, mcol, k, block_s=bs, interpret=interpret
        )
        # union of per-chunk winners -> exact second stage, still in the
        # transposed layout (see _union_select_single). Sublane padding
        # rows hold -3e38, strictly below every real candidate (masked/self
        # carry exactly -1e30), so they can never enter the top-k.
        sel = _union_select_single(vals, idxs, k, interpret=interpret)
        return sel[:k].T[:s].astype(jnp.int32)

    if mask is None:
        mcol = jnp.zeros((b, n, 128), jnp.float32)
    else:
        mcol = jnp.zeros((b, n, 128), jnp.float32)
        mcol = mcol.at[:, :, 0].set(jnp.where(mask, 0.0, _NEG))
    return jax.vmap(one)(features, seeds, mcol)
