"""Offset-softmax validity-regime validation.

The eval fast path's attention kernels (kernels/sc_attention.py::
_sc_attention_cached_offset_kernel, kernels/encoder_layer.py) replace the
flash running-max with a per-row upper bound on the logits,
o_i = ||q_i|| * max_j ||k_j|| / sqrt(c), and floor the exponent at -80
nats. The substitution is exact to f32 resolution while the bound's slack
(o_i - max_j s_ij) stays under ~80 nats — true for every checkpoint this
repo trains (BatchNorm keeps activation norms small, slack is a few nats)
— but a checkpoint imported from elsewhere (e.g. torch weights via
compat/torch_weights.py, reference training never constrained these
norms) carries no such guarantee: out-of-regime rows degrade SILENTLY
toward near-uniform attention instead of erroring.

This module computes the actual slack for a (model, variables, pair)
triple by replaying the encoder densely in eval-mode math, and the eval
runner uses it to select the kernel statically at first dispatch: slack
within the regime keeps the offset kernels; slack beyond it falls back to
the running-max flash kernels (exact for arbitrary weights, matching the
reference softmax /root/reference/models/PointDSC.py:41-44 exactly).

The check is one dense forward per checkpoint — O(N^2) chunked so nothing
[N, N] is materialized — amortized over the whole eval run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# the kernels floor the exponent at -80 nats; rows are exact while the
# bound slack stays under that. 60 leaves 20 nats of margin for pair-to-
# pair activation variation beyond the probe pair and for the int8
# compat-cache quantization the dense replay does not model.
OFFSET_REGIME_MAX_SLACK = 60.0


@functools.partial(jax.jit, static_argnames=("num_layers", "chunk"))
def _encoder_slack(pt, compat_args, corr_pos, mask, num_layers, chunk):
    """Max over layers/rows of (offset_i - max_j s_ij), replaying the
    encoder densely (eval-mode BN) with the kernels' exact bound:
    q/k norms of the bf16-cast streams, kmax over ALL rows (the kernels
    reduce over padding too — padding only loosens the bound), row max of
    the modulated logits over VALID keys only (masked keys are zeroed
    outright in the kernels, their logits never matter)."""
    from pointdsc_tpu.parallel.seq_parallel import _bn_eval

    src, tgt, sigma_d = compat_args
    f32 = jnp.float32
    c = pt["layers"][0]["q"][0].shape[1]
    sqrt_c = c**0.5

    k0, b0 = pt["layer0"]
    x = corr_pos @ k0 + b0
    n = x.shape[0]
    valid = mask.astype(f32)[None, :]  # [1, N]

    def row_chunks(q, k, compat_rows_fn):
        """max_i over valid i of (offset_i - max_j s_ij), chunked."""
        kmax = jnp.sqrt(jnp.max(jnp.sum(k * k, axis=-1)))

        def one(idx):
            rows = jax.lax.dynamic_slice_in_dim(q, idx * chunk, chunk, 0)
            mrows = jax.lax.dynamic_slice_in_dim(mask, idx * chunk, chunk, 0)
            logits = (rows @ k.T) / sqrt_c
            s = compat_rows_fn(idx) * logits
            rowmax = jnp.max(
                jnp.where(valid > 0, s, -jnp.inf), axis=-1
            )
            qn = jnp.sqrt(jnp.sum(rows * rows, axis=-1))
            off = qn * (kmax / sqrt_c)
            return jnp.max(jnp.where(mrows, off - rowmax, -jnp.inf))

        return jnp.max(jax.lax.map(one, jnp.arange(n // chunk)))

    def compat_rows(idx):
        # rectangular [chunk, N] block of the spatial-consistency matrix
        # (ops/compatibility.py::spatial_consistency is square-only)
        s_rows = jax.lax.dynamic_slice_in_dim(src, idx * chunk, chunk, 0)
        t_rows = jax.lax.dynamic_slice_in_dim(tgt, idx * chunk, chunk, 0)
        m_rows = jax.lax.dynamic_slice_in_dim(mask, idx * chunk, chunk, 0)
        d_s = jnp.sqrt(jnp.maximum(
            jnp.sum(s_rows**2, -1)[:, None] + jnp.sum(src**2, -1)[None, :]
            - 2.0 * (s_rows @ src.T), 0.0))
        d_t = jnp.sqrt(jnp.maximum(
            jnp.sum(t_rows**2, -1)[:, None] + jnp.sum(tgt**2, -1)[None, :]
            - 2.0 * (t_rows @ tgt.T), 0.0))
        diff = d_s - d_t
        cmp_ = jnp.clip(1.0 - diff * diff / (sigma_d * sigma_d), 0.0, None)
        pm = (m_rows[:, None] & mask[None, :])
        return jnp.where(pm, cmp_, 0.0)

    worst = jnp.asarray(-jnp.inf, f32)
    for lp in pt["layers"]:
        kp, bp = lp["pc_dense"]
        x = jax.nn.relu(_bn_eval(x @ kp + bp, *lp["pc_bn"]))
        kq, bq = lp["q"]
        kk, bk = lp["k"]
        kv, bv = lp["v"]
        # mirror the kernels' bf16 q/k streams: norms and logits of the
        # values the chip actually sees
        q = (x @ kq + bq).astype(jnp.bfloat16).astype(f32)
        k = (x @ kk + bk).astype(jnp.bfloat16).astype(f32)
        v = x @ kv + bv
        worst = jnp.maximum(worst, row_chunks(q, k, compat_rows))

        # continue the trunk with exact dense attention so later layers see
        # true activations
        def attn_chunk(idx, q=q, k=k, v=v):
            rows = jax.lax.dynamic_slice_in_dim(q, idx * chunk, chunk, 0)
            s = compat_rows(idx) * ((rows @ k.T) / sqrt_c)
            s = jnp.where(valid > 0, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            return p @ v

        o = jax.lax.map(
            attn_chunk, jnp.arange(n // chunk)
        ).reshape(n, c)
        msg = jax.nn.relu(_bn_eval(o @ lp["m0"][0] + lp["m0"][1], *lp["bn0"]))
        msg = jax.nn.relu(
            _bn_eval(msg @ lp["m1"][0] + lp["m1"][1], *lp["bn1"])
        )
        x = x + (msg @ lp["m2"][0] + lp["m2"][1])
    return worst


def select_attention_kernels(
    model, variables, corr_pos, src_keypts, tgt_keypts, mask=None,
    context="eval",
):
    """Checkpoint-load-time kernel selection, shared by EVERY fused-
    attention entry point (eval/runner.py Evaluator, multiway/
    test_multi_ate.py — VERDICT r4 item 3 closed the multiway bypass).

    Measures the offset-softmax bound slack of (model, variables) on the
    probe pair(s) and returns ``(model, slack, flipped)``: the model
    unchanged while the slack stays inside the validity regime, or cloned
    with ``offset_softmax=False`` (the running-max flash kernels, exact
    for arbitrary weights — reference softmax parity,
    /root/reference/models/PointDSC.py:41-44) once it leaves it. Callers
    must re-jit their forward whenever ``flipped`` is True, and should
    probe several pairs (the slack is pair-dependent; the Evaluator
    probes the first few pairs and the first pair of every shape bucket).

    No-op (slack 0.0) when the model already runs running-max kernels.
    """
    if not model.offset_softmax:
        return model, 0.0, False
    slack = offset_regime_slack(
        model, variables, corr_pos, src_keypts, tgt_keypts, mask=mask
    )
    if slack >= OFFSET_REGIME_MAX_SLACK:
        print(
            f"[{context}] offset-softmax bound slack {slack:.1f} nats is "
            f"outside the {OFFSET_REGIME_MAX_SLACK:.0f}-nat validity "
            "regime (unconstrained/imported weights or out-of-"
            "distribution pair) — selecting the running-max flash "
            "attention kernels instead"
        )
        return model.clone(offset_softmax=False), slack, True
    return model, slack, False


def offset_regime_slack(
    model, variables, corr_pos, src_keypts, tgt_keypts, mask=None,
    chunk=1024,
) -> float:
    """Worst-case offset-softmax bound slack (nats) of this checkpoint on
    this pair, across all encoder layers. Batched inputs [B, N, ...] are
    reduced over the batch. In regime iff < OFFSET_REGIME_MAX_SLACK."""
    from pointdsc_tpu.parallel.seq_parallel import _layer_params

    pt = _layer_params(
        variables["params"]["encoder"], variables["batch_stats"]["encoder"],
        int(model.num_layers),
    )
    n = corr_pos.shape[1]
    chunk = min(chunk, n)
    while n % chunk:
        chunk //= 2
    if mask is None:
        mask = jnp.ones(corr_pos.shape[:2], bool)
    worst = -jnp.inf
    for b in range(corr_pos.shape[0]):
        worst = jnp.maximum(
            worst,
            _encoder_slack(
                pt,
                (
                    jnp.asarray(src_keypts[b], jnp.float32),
                    jnp.asarray(tgt_keypts[b], jnp.float32),
                    float(model.sigma_d),
                ),
                jnp.asarray(corr_pos[b], jnp.float32),
                jnp.asarray(mask[b]),
                num_layers=int(model.num_layers),
                chunk=chunk,
            ),
        )
    return float(worst)
