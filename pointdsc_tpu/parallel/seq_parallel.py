"""Sequence-parallel (row-sharded) PointDSC inference over a device mesh.

The O(N²) objects of a single pair — the spatial-consistency matrix and
each attention layer's logits — are the reason the reference caps eval at
~20k correspondences per GPU (/root/reference/models/PointDSC.py:150-155).
The fused Pallas path removes the HBM *residency* problem on one chip; this
module removes the *single-chip* ceiling entirely: the correspondence axis
is sharded over a `jax.sharding.Mesh`, every device owns N/D rows of the
compat matrix and of each layer's attention, and only O(N·C) objects (keys,
values, coordinates, masks) cross the ICI via `all_gather`.

Per-device per-layer work and memory are exactly 1/D of the single-chip
encoder; the all-gathered K/V tensors are [N, C] (at N=65536, C=128: 32 MB
f32 per layer pair — ICI-cheap next to the N²/D compute).

Design (scaling-book recipe: shard the quadratic object, gather the linear
ones):

    rows_loc     = N / D                          (static; caller pads)
    compat_loc   = clamp(1-(|d_src|-|d_tgt|)²/σ²) [B, rows_loc, N]  local
    per layer:   PointCN (eval BN, elementwise)    local rows
                 q_loc; k,v -> all_gather -> [B, N, C]
                 softmax(compat_loc ⊙ q_loc·k_fullᵀ) · v_full       local
    features     returned as a global row-sharded [B, N, C] array

The downstream stages (confidence head, NMS, NSM over S=N/10 seeds,
refinement) are O(S·k)/O(N) and run replicated via the normal model with
`precomputed_features` (models/pointdsc.py), so SP composes with every
solver/eval variant.

Eval-only by design: training at N beyond one chip is already served by
`fused_attention` + `remat` + `fused_sm_loss` (docs/PERF.md "Large-N
training"); eval is where N grows with 'all'-mode correspondence counts.

Numerical note: this path reproduces the *dense* encoder semantics
(f32 activations, running-stat BN) — equivalence asserted at 1e-5 in
tests/test_seq_parallel.py on the 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointdsc_tpu.ops.knn import pairwise_dists_exact

_NEG_INF = -1e9
_BN_EPS = 1e-5


def _bn_eval(x, scale, bias, mean, var):
    """MaskedBatchNorm eval-mode math (models/blocks.py): running stats,
    y = x·a + (b − mean·a) with a = scale/sqrt(var+eps)."""
    a = scale / jnp.sqrt(var + _BN_EPS)
    return x * a + (bias - mean * a)


def _layer_params(params, stats, num_layers):
    """Flatten the encoder's parameter/stat tree into per-layer tuples of
    raw arrays (the tree layout is fixed by models/blocks.py holders)."""
    def dense(p):
        return p["kernel"], p["bias"]

    def bn(name_p, name_s):
        return (
            name_p["scale"], name_p["bias"], name_s["mean"], name_s["var"]
        )

    layers = []
    for i in range(num_layers):
        pc_p = params[f"PointCN_layer_{i}"]
        pc_s = stats[f"PointCN_layer_{i}"]
        nl_p = params[f"NonLocal_layer_{i}"]
        nl_s = stats[f"NonLocal_layer_{i}"]
        layers.append({
            "pc_dense": dense(pc_p["Dense_0"]),
            "pc_bn": bn(pc_p["MaskedBatchNorm_0"], pc_s["MaskedBatchNorm_0"]),
            "q": dense(nl_p["projection_q"]),
            "k": dense(nl_p["projection_k"]),
            "v": dense(nl_p["projection_v"]),
            "m0": dense(nl_p["fc_message_0"]),
            "bn0": bn(nl_p["fc_message_bn0"], nl_s["fc_message_bn0"]),
            "m1": dense(nl_p["fc_message_1"]),
            "bn1": bn(nl_p["fc_message_bn1"], nl_s["fc_message_bn1"]),
            "m2": dense(nl_p["fc_message_2"]),
        })
    return {"layer0": dense(params["layer0"]), "layers": layers}


def sp_encode(
    model,
    variables,
    corr_pos: jnp.ndarray,  # [B, N, in_dim]
    src_keypts: jnp.ndarray,  # [B, N, 3]
    tgt_keypts: jnp.ndarray,  # [B, N, 3]
    mesh: Mesh,
    mask: jnp.ndarray | None = None,
    axis_name: str = "sp",
) -> jnp.ndarray:
    """Row-sharded encoder forward (eval mode). Returns the full
    (un-normalized) correspondence features as a global [B, N, C] array
    whose rows stay sharded over `axis_name`.

    N must divide the mesh's `axis_name` size (pad + mask otherwise, as the
    data layer already does for bucketing)."""
    bsz, n = corr_pos.shape[0], corr_pos.shape[1]
    d = mesh.shape[axis_name]
    if n % d != 0:
        raise ValueError(f"N={n} must divide the '{axis_name}' mesh axis ({d})")
    if mask is None:
        mask = jnp.ones((bsz, n), dtype=bool)
    sigma_d = float(model.sigma_d)
    num_layers = int(model.num_layers)
    pt = _layer_params(
        variables["params"]["encoder"], variables["batch_stats"]["encoder"],
        num_layers,
    )

    def f(pt, cp, s, t, m):
        # shards: cp [B, n_loc, in], s/t [B, n_loc, 3], m [B, n_loc]
        gather = lambda x: jax.lax.all_gather(x, axis_name, axis=1, tiled=True)
        s_full, t_full, m_full = gather(s), gather(t), gather(m)

        # local compat rows (ops/compatibility.spatial_consistency semantics)
        diff = pairwise_dists_exact(s, s_full) - pairwise_dists_exact(t, t_full)
        compat = jnp.clip(1.0 - diff * diff / (sigma_d * sigma_d), 0.0, None)
        compat = jnp.where(
            m[..., :, None] & m_full[..., None, :], compat, 0.0
        )  # [B, n_loc, N]

        k0, b0 = pt["layer0"]
        x = cp @ k0 + b0  # [B, n_loc, C]
        c = x.shape[-1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, x.dtype))
        for lp in pt["layers"]:
            # PointCN: Dense + eval-BN + ReLU, purely local rows
            kp, bp = lp["pc_dense"]
            x = jax.nn.relu(_bn_eval(x @ kp + bp, *lp["pc_bn"]))
            # attention: q local; k/v gathered (the only O(N·C) collectives)
            kq, bq = lp["q"]
            kk, bk = lp["k"]
            kv, bv = lp["v"]
            q = x @ kq + bq
            k_full = gather(x @ kk + bk)
            v_full = gather(x @ kv + bv)
            logits = jnp.einsum(
                "bnc,bmc->bnm", q, k_full,
                preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
            ) * scale
            scores = compat * logits
            scores = jnp.where(m_full[:, None, :], scores, _NEG_INF)
            w = jax.nn.softmax(scores, axis=-1)
            msg = jnp.einsum("bnm,bmc->bnc", w.astype(v_full.dtype), v_full)
            # message MLP (C -> C/2 -> C/2 -> C), local rows
            km0, bm0 = lp["m0"]
            msg = jax.nn.relu(_bn_eval(msg @ km0 + bm0, *lp["bn0"]))
            km1, bm1 = lp["m1"]
            msg = jax.nn.relu(_bn_eval(msg @ km1 + bm1, *lp["bn1"]))
            km2, bm2 = lp["m2"]
            x = x + (msg @ km2 + bm2)
        return x  # local rows; shard_map reassembles [B, N, C]

    rows = P(None, axis_name)  # trailing dims unspecified = replicated
    fn = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(), rows, rows, rows, rows),
        out_specs=rows,
    )
    return fn(pt, corr_pos, src_keypts, tgt_keypts, mask)


def _pick_div_block(n, preferred=(2048, 1024, 512, 256, 128)):
    """Largest preferred tile size dividing n (n itself when none do)."""
    for b in preferred:
        if n >= b and n % b == 0:
            return b
    return n


def sp_encode_fused(
    model,
    variables,
    corr_pos: jnp.ndarray,
    src_keypts: jnp.ndarray,
    tgt_keypts: jnp.ndarray,
    mesh: Mesh,
    mask: jnp.ndarray | None = None,
    axis_name: str = "sp",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Production sequence-parallel encoder: per-device Pallas kernels.

    Same sharding layout as `sp_encode`, but the compat rows are built as an
    int8 (scale-127) cache tile-wise in VMEM and streamed through the cached
    flash attention kernel with bf16 q/k/v — the single-chip fused path's
    numerics (kernels/sc_attention.py), sharded: each device builds and
    streams only its [n_loc, N] cache slice, so the HBM-dominant object is
    1/D per chip in bytes AND in bandwidth."""
    bsz, n = corr_pos.shape[0], corr_pos.shape[1]
    d = mesh.shape[axis_name]
    if n % d != 0:
        raise ValueError(f"N={n} must divide the '{axis_name}' mesh axis ({d})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mask is None:
        mask = jnp.ones((bsz, n), dtype=bool)
    sigma_d = float(model.sigma_d)
    pt = _layer_params(
        variables["params"]["encoder"], variables["batch_stats"]["encoder"],
        int(model.num_layers),
    )
    n_loc = n // d
    bq = _pick_div_block(n_loc, (1024, 512, 256, 128))
    bk = _pick_div_block(n, (1024, 512, 256, 128))

    from pointdsc_tpu.kernels.sc_attention import (
        _build_compat_cache_single,
        _fused_sc_attention_cached_single,
        pack_geometry,
    )

    def f(pt, cp, s, t, m):
        gather = lambda x: jax.lax.all_gather(x, axis_name, axis=1, tiled=True)
        s_full, t_full, m_full = gather(s), gather(t), gather(m)
        geom_rows = jax.vmap(pack_geometry)(s, t, m)  # [B, 16, n_loc]
        geom_cols = jax.vmap(pack_geometry)(s_full, t_full, m_full)
        cache = jax.vmap(
            lambda gr, gc: _build_compat_cache_single(
                gr, sigma_d, block_q=bq, block_k=bk,
                interpret=interpret, geom_cols=gc,
            )
        )(geom_rows, geom_cols)  # [B, n_loc, N] int8

        k0, b0 = pt["layer0"]
        x = cp @ k0 + b0
        offset = bool(getattr(model, "offset_softmax", True))
        attn = jax.vmap(
            lambda qq, kk_, vv, cc, gc: _fused_sc_attention_cached_single(
                qq, kk_, vv, cc, gc, block_q=bq, block_k=bk,
                interpret=interpret, offset_softmax=offset,
            )
        )
        for lp in pt["layers"]:
            kp, bp = lp["pc_dense"]
            x = jax.nn.relu(_bn_eval(x @ kp + bp, *lp["pc_bn"]))
            kq, bq_ = lp["q"]
            kk, bk_ = lp["k"]
            kv, bv = lp["v"]
            q = x @ kq + bq_
            k_loc = x @ kk + bk_
            v_loc = x @ kv + bv
            if not interpret:  # bf16 streams, f32 accumulation (fused path);
                # casting BEFORE the gather halves the ICI bytes too
                q = q.astype(jnp.bfloat16)
                k_loc = k_loc.astype(jnp.bfloat16)
                v_loc = v_loc.astype(jnp.bfloat16)
            k_full = gather(k_loc)
            v_full = gather(v_loc)
            msg = attn(q, k_full, v_full, cache, geom_cols)
            km0, bm0 = lp["m0"]
            msg = jax.nn.relu(_bn_eval(msg @ km0 + bm0, *lp["bn0"]))
            km1, bm1 = lp["m1"]
            msg = jax.nn.relu(_bn_eval(msg @ km1 + bm1, *lp["bn1"]))
            km2, bm2 = lp["m2"]
            x = x + (msg @ km2 + bm2)
        return x

    rows = P(None, axis_name)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, so the static replication checker cannot type them
    fn = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(), rows, rows, rows, rows),
        out_specs=rows, check_vma=False,
    )
    return fn(pt, corr_pos, src_keypts, tgt_keypts, mask)


def sp_testing_forward(
    model,
    variables,
    corr_pos: jnp.ndarray,
    src_keypts: jnp.ndarray,
    tgt_keypts: jnp.ndarray,
    mesh: Mesh,
    mask: jnp.ndarray | None = None,
    axis_name: str = "sp",
    fused_tail: bool = True,
    fused_encoder: bool = False,
):
    """Full testing-mode forward with the encoder row-sharded over the mesh.

    Equivalent to `model.apply(variables, ..., testing=True)` on one device;
    the encoder's O(N²) stage runs sequence-parallel and the O(S·k)/O(N)
    tail (confidence, NMS, NSM, Procrustes, refinement) runs replicated
    through the normal model via `precomputed_features`.

    fused_tail=True (default) routes the tail through the Pallas fast path:
    at the N this function exists for, the dense tail's [B, S, N]
    seed-distance matrix (S = ratio·N) would itself be an O(N²/10) object —
    the fused seed-kNN kernel (kernels/seed_knn.py) never materializes it.
    Set fused_tail=False for bit-level dense-path semantics at small N.
    fused_encoder=True uses the sharded Pallas path (int8 cache + bf16
    streams, `sp_encode_fused`) instead of the dense-semantics one."""
    encode = sp_encode_fused if fused_encoder else sp_encode
    features = encode(
        model, variables, corr_pos, src_keypts, tgt_keypts, mesh,
        mask=mask, axis_name=axis_name,
    )
    return model.apply(
        variables, corr_pos, src_keypts, tgt_keypts, mask=mask,
        testing=True, precomputed_features=features,
        fused_attention=fused_tail,
    )
