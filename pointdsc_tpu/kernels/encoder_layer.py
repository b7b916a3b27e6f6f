"""Whole-encoder-layer fusion (Pallas TPU, eval fast path).

One encoder "layer" of the reference network is PointCN (Conv1d + BN +
ReLU) followed by the SC-modulated NonLocal block (QKV projections,
compat-modulated attention, 3-Dense message MLP with two BNs, residual) —
/root/reference/models/PointDSC.py:9-77. The round-2 fast path fused only
the attention; the surrounding Dense/BN/ReLU chain still made ~10 HBM
round-trips of [N, C] activations per layer plus as many dispatch
boundaries.

This kernel runs the ENTIRE layer in one pallas_call with a two-phase
grid:

  phase 1 (grid row i==0, j over row tiles): x -> h = relu(x W1' + b1')
      (BN folded into W1/b1 — eval uses running stats, so BN is an exact
      per-channel affine), qkv = h Wqkv + bqkv; h kept in f32 VMEM
      scratch, q/k/v stored bf16 in VMEM scratch. Nothing leaves the chip.
  phase 2 (rows i>=1, q tile qi=i-1, j over key tiles): int8-cached
      compat attention with online softmax (same math as
      kernels/sc_attention.py::_sc_attention_cached_kernel); on the last
      key tile the message MLP (BN-folded) and residual h + msg run in
      VMEM and only the final [bq, C] layer output is written to HBM.

Per-layer HBM traffic drops from ~35 MB of activation round-trips + the
compat stream to: x read + out write (2 x N*C*4 bytes) + the compat
stream. VMEM holds h (f32) and q/k/v (bf16) for the whole N, so the
kernel is gated to N <= MAX_FUSED_LAYER_N; larger sizes keep the
per-op path.

Equivalence vs the unfused fast path is asserted in
tests/test_encoder_layer_kernel.py; quality equivalence of the whole
pipeline in tools/eval_quality_equivalence.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# h (f32) + q/k/v (bf16) VMEM scratch = N * C * 10 bytes; with tile
# buffers and softmax scratch the budget tops out around N ~ 6k on a
# 16 MB-VMEM core. Larger N uses the SPLIT pair of kernels below
# (PointCN+QKV one pass -> HBM; attention+MLP+residual one pass), which
# streams k/v per query row instead of pinning them in VMEM.
MAX_FUSED_LAYER_N = 6144


def fold_bn(kernel, bias, scale, bn_bias, mean, var, eps=1e-5):
    """Fold an eval-mode BatchNorm (y = (x - mean)/sqrt(var+eps) * scale
    + bias) into the preceding Dense: returns (kernel', bias')."""
    a = scale / jnp.sqrt(var + eps)
    return kernel * a[None, :], bias * a + (bn_bias - mean * a)


def _offset_attn_p(q, k, compat, kbias_row, scale, offset, has_bias):
    """Shared attention step of both whole-layer kernels: compat-modulated
    logits, offset-softmax exponential (floored at -80 nats), masked keys
    zeroed exactly. Returns the unnormalized weights p (f32)."""
    f32 = jnp.float32
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) * scale
    s = compat.astype(f32) * logits
    if has_bias:
        s = s + kbias_row
    p = jnp.exp(jnp.maximum(s - offset, -80.0))
    if has_bias:
        # the -80 floor keeps out-of-regime rows finite, but it must never
        # resurrect masked keys: zero them outright (the reference softmax
        # with a -1e9 bias gives them exactly 0)
        p = jnp.where(kbias_row < 0.0, 0.0, p)
    return p


def _message_mlp_residual(o, h, wm0_ref, bm0_ref, wm1_ref, bm1_ref,
                          wm2_ref, bm2_ref):
    """Shared epilogue: 3-Dense message MLP (BN folded) + residual."""
    f32 = jnp.float32
    msg = jnp.maximum(
        jax.lax.dot_general(
            o, wm0_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bm0_ref[:],
        0.0,
    )
    msg = jnp.maximum(
        jax.lax.dot_general(
            msg, wm1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bm1_ref[:],
        0.0,
    )
    msg = (
        jax.lax.dot_general(
            msg, wm2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bm2_ref[:]
    )
    return h + msg


def _make_kernel(n, c, bq, bk, has_bias, n_k):
    scale = 1.0 / (c**0.5) / 127.0  # qk scale with the int8 decode folded in

    def kernel(
        x_ref,  # (bk, c) f32: row tile (phase 1)
        compat_ref,  # (bq, bk) int8
        kbias_ref,  # (8, bk) f32: row 0 = key bias (only read if has_bias)
        w1_ref, b1_ref,  # (c, c), (1, c)  [BN folded]
        wqkv_ref, bqkv_ref,  # (c, 3c), (1, 3c)
        wm0_ref, bm0_ref,  # (c, c//2), (1, c//2)  [BN folded]
        wm1_ref, bm1_ref,  # (c//2, c//2), (1, c//2)  [BN folded]
        wm2_ref, bm2_ref,  # (c//2, c), (1, c)
        out_ref,  # (bq, c) f32
        h_scr,  # (n, c) f32
        q_scr, k_scr, v_scr,  # (n, c) bf16
        ml_scr,  # (bq, 128) f32: col 0 = per-row softmax offset, col 1 = sumexp
        acc_scr,  # (bq, c) f32
        kmax_scr,  # SMEM (1, 1) f32: running max ||k_j|| over phase-1 tiles
    ):
        i = pl.program_id(0)
        j = pl.program_id(1)
        f32 = jnp.float32

        @pl.when(i == 0)
        def _phase1():
            x = x_ref[:]
            h = jnp.maximum(
                jax.lax.dot_general(
                    x, w1_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                + b1_ref[:],
                0.0,
            )
            rows = pl.ds(j * bk, bk)
            h_scr[rows, :] = h
            qkv = (
                jax.lax.dot_general(
                    h, wqkv_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                + bqkv_ref[:]
            )
            q_scr[rows, :] = qkv[:, 0:c].astype(jnp.bfloat16)
            kt = qkv[:, c:2 * c].astype(jnp.bfloat16)
            k_scr[rows, :] = kt
            v_scr[rows, :] = qkv[:, 2 * c:3 * c].astype(jnp.bfloat16)
            # running max key norm for the offset softmax (phase 2); the
            # grid is sequential, so phase 1 finishes before phase 2 reads
            ktf = kt.astype(f32)
            tile_kmax = jnp.sqrt(jnp.max(jnp.sum(ktf * ktf, axis=-1)))

            @pl.when(j == 0)
            def _seed():
                kmax_scr[0, 0] = tile_kmax

            @pl.when(j > 0)
            def _accum():
                kmax_scr[0, 0] = jnp.maximum(kmax_scr[0, 0], tile_kmax)

        @pl.when(i > 0)
        def _phase2():
            qi = i - 1

            @pl.when(j == 0)
            def _init():
                # offset softmax (see sc_attention.py::
                # _sc_attention_cached_offset_kernel): o_i = ||q_i|| *
                # max_j ||k_j|| / sqrt(c) bounds every compat-modulated
                # logit, so the per-tile running-max pass, alpha rescale
                # and m bookkeeping drop out of the flash loop
                qf = q_scr[pl.ds(qi * bq, bq), :].astype(f32)
                qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
                ml_scr[:, 0:1] = qn * (kmax_scr[0, 0] * (1.0 / (c**0.5)))
                ml_scr[:, 1:2] = jnp.zeros_like(ml_scr[:, 1:2])
                acc_scr[:] = jnp.zeros_like(acc_scr)

            q = q_scr[pl.ds(qi * bq, bq), :]
            k = k_scr[pl.ds(j * bk, bk), :]
            v = v_scr[pl.ds(j * bk, bk), :]
            p = _offset_attn_p(
                q, k, compat_ref[:], kbias_ref[0:1, :], scale,
                ml_scr[:, 0:1], has_bias,
            )
            ml_scr[:, 1:2] += jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            acc_scr[:] = acc_scr[:] + pv

            @pl.when(j == n_k - 1)
            def _epilogue():
                o = acc_scr[:] / (ml_scr[:, 1:2] + 1e-30)
                out_ref[:] = _message_mlp_residual(
                    o, h_scr[pl.ds(qi * bq, bq), :],
                    wm0_ref, bm0_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
                )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "has_bias", "interpret")
)
def _fused_layer_single(
    x, compat, kbias, weights, block_q=1024, block_k=1024, has_bias=False,
    interpret=False,
):
    n, c = x.shape
    bq, bk = min(block_q, n), min(block_k, n)
    # adapt to any bucket size (the data layer guarantees multiples of 512,
    # not of 1024) — same halving rule as the split kernel below
    while n % bq:
        bq //= 2
    while n % bk:
        bk //= 2
    n_q, n_k = n // bq, n // bk
    kernel = _make_kernel(n, c, bq, bk, has_bias, n_k)
    (w1, b1, wqkv, bqkv, wm0, bm0, wm1, bm1, wm2, bm2) = weights

    def row2(v):  # biases as (1, len) so TPU sees 2-D operands
        return v.reshape(1, -1)

    full = lambda arr: pl.BlockSpec(arr.shape, lambda i, j: (0, 0))
    grid = (n_q + 1, n_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # phase 1 consumes row tile j; phase 2 pins block 0 (no refetch)
            pl.BlockSpec((bk, c), lambda i, j: (jnp.where(i == 0, j, 0), 0)),
            # phase 1 (i==0) maps to row 0 blocks: those prefetches overlap
            # phase-1 compute and are exactly the tiles phase 2's first row
            # (i==1) needs — pinning a single block here measured ~0.3 ms
            # SLOWER because i==1 then fetches its row cold
            pl.BlockSpec((bq, bk), lambda i, j: (jnp.maximum(i - 1, 0), j)),
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),
            full(w1), pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            full(wqkv), pl.BlockSpec((1, 3 * c), lambda i, j: (0, 0)),
            full(wm0), pl.BlockSpec((1, c // 2), lambda i, j: (0, 0)),
            full(wm1), pl.BlockSpec((1, c // 2), lambda i, j: (0, 0)),
            full(wm2), pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bq, c), lambda i, j: (jnp.maximum(i - 1, 0), 0)),
        scratch_shapes=[
            pltpu.VMEM((n, c), jnp.float32),
            pltpu.VMEM((n, c), jnp.bfloat16),
            pltpu.VMEM((n, c), jnp.bfloat16),
            pltpu.VMEM((n, c), jnp.bfloat16),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        interpret=interpret,
    )(
        x, compat, kbias,
        w1, row2(b1), wqkv, row2(bqkv),
        wm0, row2(bm0), wm1, row2(bm1), wm2, row2(bm2),
    )


def _pcn_qkv_kernel(
    x_ref,  # (bt, c_in) f32
    w1_ref, b1_ref,  # (c_in, c), (1, c)  [BN folded]
    wqkv_ref, bqkv_ref,  # (c, 3c), (1, 3c)
    h_ref,  # (bt, c) f32 out
    q_ref, k_ref, v_ref,  # (bt, c) bf16 out
    kscale_ref,  # (1, 1) f32 out: max_j ||k_j|| / sqrt(c) (offset softmax)
    kmax_scr,  # SMEM (1, 1) f32: running max over row tiles
):
    """Split-layer phase A: PointCN (BN folded) + fused QKV projection in
    one pass over the row tiles. h stays f32 (it is the residual trunk);
    q/k/v are written bf16 for the attention stream. The offset-softmax
    key-norm bound accumulates in SMEM across the (sequential) grid — a
    separate XLA pass would re-read the whole [N, C] k from HBM per layer."""
    i = pl.program_id(0)
    f32 = jnp.float32
    c = w1_ref.shape[1]
    h = jnp.maximum(
        jax.lax.dot_general(
            x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + b1_ref[:],
        0.0,
    )
    h_ref[:] = h
    qkv = (
        jax.lax.dot_general(
            h, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bqkv_ref[:]
    )
    q_ref[:] = qkv[:, 0:c].astype(jnp.bfloat16)
    kt = qkv[:, c:2 * c].astype(jnp.bfloat16)
    k_ref[:] = kt
    v_ref[:] = qkv[:, 2 * c:3 * c].astype(jnp.bfloat16)
    # norm of the bf16-cast keys (phase B streams those exact values)
    ktf = kt.astype(f32)
    tile_kmax = jnp.sqrt(jnp.max(jnp.sum(ktf * ktf, axis=-1)))

    @pl.when(i == 0)
    def _seed():
        kmax_scr[0, 0] = tile_kmax

    @pl.when(i > 0)
    def _accum():
        kmax_scr[0, 0] = jnp.maximum(kmax_scr[0, 0], tile_kmax)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        kscale_ref[0, 0] = kmax_scr[0, 0] * (1.0 / (c**0.5))


def _make_attn_mlp_kernel(c, has_bias, n_k):
    scale = 1.0 / (c**0.5) / 127.0  # qk scale with the int8 decode folded in

    def kernel(
        kscale_ref,  # SMEM (1, 1): max_j ||k_j|| / sqrt(c) (offset softmax)
        q_ref,  # (bq, c) bf16
        k_ref, v_ref,  # (bk, c) bf16
        compat_ref,  # (bq, bk) int8
        kbias_ref,  # (8, bk) f32 (row 0 = key bias; only read if has_bias)
        h_ref,  # (bq, c) f32: residual trunk tile
        wm0_ref, bm0_ref,  # (c, c//2), (1, c//2)  [BN folded]
        wm1_ref, bm1_ref,  # (c//2, c//2), (1, c//2)  [BN folded]
        wm2_ref, bm2_ref,  # (c//2, c), (1, c)
        out_ref,  # (bq, c) f32
        ml_scr,  # (bq, 128) f32: col 0 = per-row offset, col 1 = sumexp
        acc_scr,  # (bq, c) f32
    ):
        """Split-layer phase B: cached-compat offset-softmax attention with
        the message MLP + residual fused into the last-key-tile epilogue.
        Same math as the monolithic kernel above; h/q/k/v stream from HBM
        (written by phase A) instead of VMEM scratch, so N is unbounded."""
        j = pl.program_id(1)
        f32 = jnp.float32

        @pl.when(j == 0)
        def _init():
            qf = q_ref[:].astype(f32)
            qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
            ml_scr[:, 0:1] = qn * kscale_ref[0, 0]
            ml_scr[:, 1:2] = jnp.zeros_like(ml_scr[:, 1:2])
            acc_scr[:] = jnp.zeros_like(acc_scr)

        p = _offset_attn_p(
            q_ref[:], k_ref[:], compat_ref[:], kbias_ref[0:1, :], scale,
            ml_scr[:, 0:1], has_bias,
        )
        ml_scr[:, 1:2] += jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

        @pl.when(j == n_k - 1)
        def _epilogue():
            o = acc_scr[:] / (ml_scr[:, 1:2] + 1e-30)
            out_ref[:] = _message_mlp_residual(
                o, h_ref[:],
                wm0_ref, bm0_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "has_bias", "interpret")
)
def _fused_layer_split_single(
    x, compat, kbias, weights, block_q=2048, block_k=1024, has_bias=False,
    interpret=False,
):
    """Large-N whole-layer fusion as TWO pallas_calls (see module docstring).

    Per-layer HBM traffic: x read + h/q/k/v write+read (q/h once, k/v once
    per query row of tiles) + the compat stream + out write — the ~10
    per-op XLA round-trips of the unfused path collapse into two passes.

    Tiles swept on v5e at N=20480 (tools/tune_layer_split.py, round-4
    re-measurement on the working kernel): 4096x1024 = 1.121 ms/layer
    standalone vs 1.181 for 2048x1024 and 1.210 for 1024x1024 (bigger
    query tiles cut the k/v re-streaming), but bq=4096 needs a ~32 MB
    scoped-VMEM window that triggers compile-time OOM flakiness in the
    full e2e graph and measured slightly WORSE end-to-end, so 2048x1024
    stays the default. Phase B runs at ~96% of the bf16 MXU roofline
    (the two N^2 C matmuls cost 1.08 ms/layer at v5e's 197 TFLOPs peak),
    so the layer time is compute-bound, not a tuning gap: int8 MXU (2x
    peak) was measured to be a wash because the per-element dequant work
    on the N^2 logits costs more VPU time than the MXU time it saves
    (round-4 probes).
    """
    n, c = x.shape
    bq, bk = min(block_q, n), min(block_k, n)
    while n % bq:
        bq //= 2
    while n % bk:
        bk //= 2
    (w1, b1, wqkv, bqkv, wm0, bm0, wm1, bm1, wm2, bm2) = weights

    def row2(v):
        return v.reshape(1, -1)

    full = lambda arr: pl.BlockSpec(arr.shape, lambda *_: (0,) * arr.ndim)
    bt = bk  # phase-A row tile
    h, q, k, v, kscale = pl.pallas_call(
        _pcn_qkv_kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, c), lambda i: (i, 0)),
            full(w1), pl.BlockSpec((1, c), lambda i: (0, 0)),
            full(wqkv), pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((bt, c), lambda i: (i, 0))] * 4
        # kscale is a (1, 1) scalar: it must live in SMEM — Mosaic rejects
        # scalar stores to VMEM, and phase B reads it via SMEM anyway
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(x, w1, row2(b1), wqkv, row2(bqkv))

    kw = {}
    if not interpret:
        # the 2048x1024 tile set sits ~75 KB above the default 16 MB scoped
        # VMEM window once double-buffering is counted; v5e has 128 MB of
        # physical VMEM, so widen the scope rather than shrink the tiles
        # (1024x1024 measured 14% slower, tools/tune_layer_split.py).
        # Scale the window with the query tile: bq=4096 needs ~32 MB.
        # NOTE: the formula scales with bq only — the key-tile term (the
        # [bq, bk] compat block + double-buffered k/v tiles) is sized for
        # bk <= 1024, the only validated combos for bq > 2048; a larger bk
        # needs its own window term or it may OOM at compile time.
        vmem_mb = 24 if bq <= 2048 else 24 + (bq // 2048) * 8
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        )
    kernel = _make_attn_mlp_kernel(c, has_bias, n // bk)
    return pl.pallas_call(
        kernel,
        grid=(n // bq, n // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, c), lambda qi, kj: (qi, 0)),
            pl.BlockSpec((bk, c), lambda qi, kj: (kj, 0)),
            pl.BlockSpec((bk, c), lambda qi, kj: (kj, 0)),
            pl.BlockSpec((bq, bk), lambda qi, kj: (qi, kj)),
            pl.BlockSpec((8, bk), lambda qi, kj: (0, kj)),
            pl.BlockSpec((bq, c), lambda qi, kj: (qi, 0)),
            full(wm0), pl.BlockSpec((1, c // 2), lambda qi, kj: (0, 0)),
            full(wm1), pl.BlockSpec((1, c // 2), lambda qi, kj: (0, 0)),
            full(wm2), pl.BlockSpec((1, c), lambda qi, kj: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bq, c), lambda qi, kj: (qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, c), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        **kw,
        interpret=interpret,
    )(
        kscale, q, k, v, compat, kbias, h,
        wm0, row2(bm0), wm1, row2(bm1), wm2, row2(bm2),
    )


def make_fused_layer_fn(compat_cache, mask=None, interpret=None):
    """Build the per-layer hook consumed by NonLocalNet's fused-layer path.

    Args:
        compat_cache: [B, N, N] int8 shared spatial-consistency cache.
        mask: [B, N] bool or None.
    Returns fn(x, pcn_params, nl_params) -> x where the param tuples come
    from the flax holder modules (see models/blocks.py):
        pcn_params = (w1, b1, bn1)           bn1 = (scale, bias, mean, var)
        nl_params = (wq, bq_, wk, bk_, wv, bv, wm0, bm0_, bn_m0,
                     wm1, bm1_, bn_m1, wm2, bm2_)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = compat_cache.shape[-1]
    if mask is None:
        kbias = jnp.zeros((compat_cache.shape[0], 8, n), jnp.float32)
        has_bias = False
    else:
        row = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
        kbias = jnp.zeros((compat_cache.shape[0], 8, n), jnp.float32)
        kbias = kbias.at[:, 0, :].set(row)
        has_bias = True

    def layer_fn(x, pcn_params, nl_params):
        (w1, b1, (s1, bb1, m1, v1)) = pcn_params
        (wq, bq_, wk, bk_, wv, bv,
         wm0, bm0_, (sm0, bbm0, mm0, vm0),
         wm1, bm1_, (sm1, bbm1, mm1, vm1),
         wm2, bm2_) = nl_params

        w1f, b1f = fold_bn(w1, b1, s1, bb1, m1, v1)
        wqkv = jnp.concatenate([wq, wk, wv], axis=-1)
        bqkv = jnp.concatenate([bq_, bk_, bv], axis=-1)
        wm0f, bm0f = fold_bn(wm0, bm0_, sm0, bbm0, mm0, vm0)
        wm1f, bm1f = fold_bn(wm1, bm1_, sm1, bbm1, mm1, vm1)
        weights = tuple(
            w.astype(jnp.float32)
            for w in (w1f, b1f, wqkv, bqkv, wm0f, bm0f, wm1f, bm1f, wm2, bm2_)
        )
        single = (
            _fused_layer_single if n <= MAX_FUSED_LAYER_N
            else _fused_layer_split_single
        )
        fn = functools.partial(single, has_bias=has_bias, interpret=interpret)
        return jax.vmap(lambda xx, cc, bb: fn(xx, cc, bb, weights))(
            x.astype(jnp.float32), compat_cache, kbias
        )

    return layer_fn
