"""Fused spectral-matching loss (Pallas TPU, forward + custom VJP).

The reference computes the SM loss by materializing the feature-similarity
matrix M = clamp(1 - (1 - F F^T)/sigma^2, 0, 1) (zero diagonal) and taking a
balanced MSE against the gt inlier outer product
(/root/reference/models/PointDSC.py:158-165 + libs/loss.py:115-139). In
training that is the dominant HBM term: a [bs, N, N] f32 chain in BOTH
passes (several GB of traffic at bs=16, N=1024; prohibitive at KITTI's
N=12k).

This module computes the identical loss and gradients tile-wise:

  forward:  per (i, j) tile, S = F_i F_j^T on the MXU, M tile in VMEM,
            accumulate  sum_p = sum (M-1)^2 over gt-positive pairs and
            sum_n = sum M^2 over valid negative pairs. Only two scalars
            per sample leave the kernel.
  backward: recompute the tile, g = d(loss)/dM (per-sample balance weights
            folded in), gate = clamp interior, and accumulate
            dF_i += (2/sigma^2) (g * gate) F_j    (MXU)
            dsigma += sum g * gate * 2 (1 - S)/sigma^3.

Denominators/balance weights need only label counts, so they are closed
forms in jnp (no N^2). Equivalence (loss + grads) vs the dense
feature_similarity -> spectral_matching_loss chain is asserted in
tests/test_sm_loss_kernel.py for balanced/unbalanced x masked/unmasked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_labels(gt_labels, mask):
    """[8, N] f32 strip: row 0 = gt (masked to 0), row 1 = valid (1/0)."""
    n = gt_labels.shape[0]
    m = mask.astype(jnp.float32)
    gt = gt_labels.astype(jnp.float32) * m
    zeros = jnp.zeros((6, n), jnp.float32)
    return jnp.concatenate([gt[None], m[None], zeros], axis=0)


def _tile_masks(i, j, bq, bk, gq, gk):
    """(gtM, negM) tiles from label strips; diagonal excluded from gtM and
    neutralized in negM via the M tile's own zero diagonal."""
    gt_q, m_q = gq[0:1, :].T, gq[1:2, :].T  # (bq, 1)
    gt_k, m_k = gk[0:1, :], gk[1:2, :]  # (1, bk)
    pm = m_q * m_k
    gtM = gt_q * gt_k
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + i * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + j * bk
    offdiag = (rows != cols).astype(jnp.float32)
    gtM = gtM * offdiag
    return pm, gtM, offdiag


def _m_tile(fq, fk, sigma, i, j, bq, bk, gq, gk):
    """Returns (S, M, pm, gtM, gate). M has the exact model semantics:
    clamp interior, zero diagonal, arbitrary at invalid pairs (callers
    multiply by pm)."""
    f32 = jnp.float32
    S = jax.lax.dot_general(
        fq, fk, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # (bq, bk)
    pm, gtM, offdiag = _tile_masks(i, j, bq, bk, gq, gk)
    u = 1.0 - (1.0 - S) / (sigma * sigma)
    M = jnp.clip(u, 0.0, 1.0) * offdiag
    gate = ((u > 0.0) & (u < 1.0)).astype(f32) * offdiag * pm
    return S, M, pm, gtM, gate


def _scalar_slots(values):
    """(8, 128) f32 tile with values[s] at [0, s] (TPU VMEM cannot store
    scalars; build the whole vector with iota masks instead)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for s, v in enumerate(values):
        out = out + jnp.where((rows == 0) & (cols == s), v, 0.0)
    return out


def _sm_loss_fwd_kernel(s_ref, fq_ref, fk_ref, gq_ref, gk_ref, out_ref, acc):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        acc[0] = 0.0
        acc[1] = 0.0

    sigma = s_ref[0, 0]
    bq, bk = fq_ref.shape[0], fk_ref.shape[0]
    _, M, pm, gtM, _ = _m_tile(
        fq_ref[:], fk_ref[:], sigma, i, j, bq, bk, gq_ref[:], gk_ref[:]
    )
    acc[0] += jnp.sum(((M - 1.0) ** 2) * gtM)
    acc[1] += jnp.sum((M * M) * (pm - gtM))

    @pl.when((i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1))
    def _fin():
        out_ref[:] = _scalar_slots([acc[0], acc[1]])


def _sm_loss_bwd_kernel(
    s_ref, fq_ref, fk_ref, gq_ref, gk_ref, df_ref, ds_ref, df_scr, ds_scr
):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init_global():
        ds_scr[0] = 0.0

    @pl.when(j == 0)
    def _init_row():
        df_scr[:] = jnp.zeros_like(df_scr)

    sigma = s_ref[0, 0]
    wp = s_ref[0, 1]
    wn = s_ref[0, 2]
    bq, bk = fq_ref.shape[0], fk_ref.shape[0]
    S, M, pm, gtM, gate = _m_tile(
        fq_ref[:], fk_ref[:], sigma, i, j, bq, bk, gq_ref[:], gk_ref[:]
    )
    # dL/dM, per-sample balance weights already folded into wp / wn
    g = wp * 2.0 * (M - 1.0) * gtM + wn * 2.0 * M * (pm - gtM)
    gg = g * gate
    # dF_i += (2 / sigma^2) (g*gate) @ F_j  — the factor 2 accounts for the
    # symmetric (j, i) tile contribution (g and gate are symmetric in (i, j))
    df_scr[:] += (2.0 / (sigma * sigma)) * jax.lax.dot_general(
        gg, fk_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_scr[0] += jnp.sum(gg * 2.0 * (1.0 - S)) / (sigma * sigma * sigma)

    @pl.when(j == pl.num_programs(1) - 1)
    def _fin_row():
        df_ref[:] = df_scr[:]

    @pl.when((i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1))
    def _fin_global():
        ds_ref[:] = _scalar_slots([ds_scr[0]])


def _pick_blocks(n):
    """Largest tile size <= 512 that divides n and is Mosaic-lane-legal.

    The tile size appears as the LANE width of the (8, bq) label-strip
    blocks, where Mosaic requires a multiple of 128 or the full dimension —
    so legal sizes are n itself (single tile, n <= 512) or 128-multiples
    dividing n. Returns None when no legal tiling exists (e.g. n = 1000,
    whose only divisors <= 512 are 8-smooth); callers fall back to the
    dense chain there."""
    if n <= 512:
        return n, n
    for b in (512, 384, 256, 128):
        if n % b == 0:
            return b, b
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_single(f, labels_strip, scalars, interpret=False):
    n, c = f.shape
    bq, bk = _pick_blocks(n)
    out = pl.pallas_call(
        _sm_loss_fwd_kernel,
        grid=(n // bq, n // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, c), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, c), lambda i, j: (j, 0)),
            pl.BlockSpec((8, bq), lambda i, j: (0, i)),
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(scalars, f, f, labels_strip, labels_strip)
    return out[0, 0], out[0, 1]  # sum_p, sum_n


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_single(f, labels_strip, scalars, interpret=False):
    n, c = f.shape
    bq, bk = _pick_blocks(n)
    df, ds = pl.pallas_call(
        _sm_loss_bwd_kernel,
        grid=(n // bq, n // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, c), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, c), lambda i, j: (j, 0)),
            pl.BlockSpec((8, bq), lambda i, j: (0, i)),
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((bq, c), lambda i, j: (i, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(scalars, f, f, labels_strip, labels_strip)
    return df, ds[0, 0]


def _count_terms(gt_labels, mask):
    """Closed-form pair counts (no N^2): off-diagonal positive pairs and
    valid negative pairs (diagonal included, matching the reference
    denominators — see spectral_matching_loss)."""
    m = mask.astype(jnp.float32)
    gt = gt_labels.astype(jnp.float32) * m
    s_gt = jnp.sum(gt, axis=-1)
    s_m = jnp.sum(m, axis=-1)
    npos = s_gt * s_gt - s_gt  # gt outer product minus its diagonal
    nneg = s_m * s_m - npos  # all valid pairs minus positives
    return npos, nneg


def fused_spectral_matching_loss(
    normed_features, sigma, gt_labels, mask, balanced=True, interpret=None
):
    """Drop-in replacement for
    feature_similarity(...) -> spectral_matching_loss(...) that never
    materializes M. Differentiable in (normed_features, sigma).

    Args:
        normed_features: [B, N, C] L2-normalized correspondence features.
        sigma: scalar (the model's learned sigma parameter).
        gt_labels: [B, N] 0/1. mask: [B, N] bool.
        balanced: reference `loss.balanced` (libs/loss.py:120).

    N without a Mosaic-legal tiling (see _pick_blocks) routes through the
    dense chain instead — identical loss/grads, just with M materialized;
    such N are below the ~4k size where the kernel pays anyway.
    """
    if _pick_blocks(normed_features.shape[1]) is None:
        from pointdsc_tpu.ops.compatibility import feature_similarity
        from pointdsc_tpu.train.losses import spectral_matching_loss

        M = feature_similarity(normed_features, sigma, mask=mask)
        return spectral_matching_loss(M, gt_labels, mask=mask, balanced=balanced)
    return _fused_sm_kernel_loss(
        normed_features, sigma, gt_labels, mask, balanced, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_sm_kernel_loss(
    normed_features, sigma, gt_labels, mask, balanced=True, interpret=None
):
    loss, _ = _fused_sm_fwd(
        normed_features, sigma, gt_labels, mask, balanced, interpret
    )
    return loss


def _weights(balanced, npos, nneg, batch):
    """Per-sample (wp, wn) multipliers on the raw tile sums, chosen so the
    assembled scalar equals the dense reference loss."""
    denom_p = jnp.maximum(npos - 1.0, 0.0) + 1.0
    denom_n = jnp.maximum(nneg - 1.0, 0.0) + 1.0
    if balanced:
        wp = 0.5 / (batch * denom_p)
        wn = 0.5 / (batch * denom_n)
    else:
        total = jnp.maximum(jnp.sum(npos + nneg), 1.0)
        wp = jnp.full_like(denom_p, 1.0 / total)
        wn = wp
    return wp, wn


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fused_sm_fwd(normed_features, sigma, gt_labels, mask, balanced, interpret):
    interpret = _resolve_interpret(interpret)
    f = normed_features.astype(jnp.float32)
    b = f.shape[0]
    strips = jax.vmap(_pack_labels)(gt_labels, mask)
    npos, nneg = _count_terms(gt_labels, mask)
    wp, wn = _weights(balanced, npos, nneg, float(b))

    sig = jnp.broadcast_to(
        jnp.asarray(sigma, jnp.float32).reshape(1, 1), (b, 1, 1)
    )
    zeros = jnp.zeros((b, 1, 1), jnp.float32)
    scalars = jnp.concatenate(
        [sig, wp.reshape(b, 1, 1), wn.reshape(b, 1, 1), zeros], axis=-1
    )  # [B, 1, 4]

    sum_p, sum_n = jax.vmap(
        lambda ff, ss, sc: _fwd_single(ff, ss, sc, interpret=interpret)
    )(f, strips, scalars)
    loss = jnp.sum(wp * sum_p + wn * sum_n)
    residuals = (f, strips, scalars, jnp.shape(sigma))
    return loss, residuals


def _fused_sm_bwd(balanced, interpret, residuals, dloss):
    interpret = _resolve_interpret(interpret)
    f, strips, scalars, sigma_shape = residuals
    df, ds = jax.vmap(
        lambda ff, ss, sc: _bwd_single(ff, ss, sc, interpret=interpret)
    )(f, strips, scalars)
    # sigma is a single element (possibly shaped (1,) as the model param)
    dsigma = jnp.reshape(dloss * jnp.sum(ds), sigma_shape).astype(jnp.float32)
    return ((dloss * df).astype(f.dtype), dsigma, None, None)


_fused_sm_kernel_loss.defvjp(_fused_sm_fwd, _fused_sm_bwd)
