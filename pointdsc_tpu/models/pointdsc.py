"""PointDSC model: one jitted XLA program from correspondences to SE(3).

TPU-native rebuild of /root/reference/models/PointDSC.py:80-438. Differences
from the reference that matter for TPU execution:

  * channels-last layout; all 1x1 convs are Dense matmuls on the MXU;
  * static shapes with an explicit validity mask instead of variable
    correspondence counts (padding/bucketing happens in the data layer);
  * the weighted Procrustes step runs on device via Horn's quaternion method
    (no CPU SVD round-trip, cf. common.py:36);
  * post-refinement is a bounded `lax.while_loop` whose masked weighted
    re-fit replaces boolean indexing (PointDSC.py:403-438);
  * testing/training behavior is selected by *static* flags so each variant
    compiles to its own specialized program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from pointdsc_tpu.models.blocks import NonLocalNet
from pointdsc_tpu.ops.compatibility import spatial_consistency, feature_similarity
from pointdsc_tpu.ops.eig import power_iteration
from pointdsc_tpu.ops.knn import pairwise_dists
from pointdsc_tpu.ops.nms import pick_seeds_nms, pick_seeds_topk
from pointdsc_tpu.ops.procrustes import weighted_procrustes
from pointdsc_tpu.ops.se3 import transform

# below this size the XLA sort-based exact selection is already sub-ms and
# the fused kernel's fixed overheads do not pay (swept on v5e)
_SEED_KNN_FUSED_MIN_N = 4096


class PointDSCOutput(NamedTuple):
    """Forward results (mirrors the reference output dict, PointDSC.py:192-196)."""

    final_trans: jnp.ndarray  # [B, 4, 4]
    final_labels: jnp.ndarray  # [B, N] logits (train) or 0/1 labels (test)
    M: jnp.ndarray | None  # [B, N, N] feature similarity (train only)
    seed_trans: jnp.ndarray  # [B, S, 4, 4]
    seed_fitness: jnp.ndarray  # [B, S]
    confidence: jnp.ndarray  # [B, N] classification logits
    # inputs of the fused SM-loss kernel (kernels/sm_loss.py): lets the
    # trainer compute the SM loss without any [B, N, N] tensor existing
    normed_features: jnp.ndarray | None = None  # [B, N, C]
    sigma: jnp.ndarray | None = None  # learned similarity bandwidth, (1,)


class PointDSC(nn.Module):
    """Spatial-consistency outlier rejection + SE(3) estimation network."""

    in_dim: int = 6
    num_layers: int = 12
    num_channels: int = 128
    num_iterations: int = 10  # power iteration steps in NSM
    ratio: float = 0.1  # seed ratio
    inlier_threshold: float = 0.10
    sigma_d: float = 0.10
    k: int = 40  # NSM neighborhood size
    nms_radius: float = 0.10
    refine_iters: int = 20
    attention_fn: Callable | None = None  # pluggable fused attention kernel
    half_precision: bool = False  # bf16 encoder matmuls, f32 accumulation
    approx_knn: bool = False  # TPU-optimized approx top-k for NSM neighbors
    remat: bool = False  # rematerialize encoder layers (training memory)
    fused_cache_compat: bool = True  # share one bf16 compat cache across layers
    # offset-softmax eval kernels (exact within the bound-slack regime,
    # models/regime.py). False selects the running-max flash kernels —
    # exact for ARBITRARY weights (e.g. imported torch checkpoints whose
    # activation norms were never constrained); the eval runner validates
    # the regime at first dispatch and flips this statically when needed.
    offset_softmax: bool = True

    @nn.compact
    def __call__(
        self,
        corr_pos: jnp.ndarray,  # [B, N, in_dim]
        src_keypts: jnp.ndarray,  # [B, N, 3]
        tgt_keypts: jnp.ndarray,  # [B, N, 3]
        mask: jnp.ndarray | None = None,  # [B, N] bool
        testing: bool = False,
        train: bool = False,
        fused_attention: bool = False,
        skip_M: bool = False,
        precomputed_features: jnp.ndarray | None = None,
    ) -> PointDSCOutput:
        """skip_M=True suppresses materializing the [B, N, N] feature
        similarity matrix in training mode; the trainer then computes the
        SM loss with the fused Pallas kernel from (normed_features, sigma)
        returned in the output (config.fused_sm_loss).

        precomputed_features lets a caller substitute externally computed
        encoder output [B, N, C] — the sequence-parallel path
        (parallel/seq_parallel.py) row-shards the O(N²) encoder over a mesh
        and runs the O(S·k)/O(N) tail through this module unchanged."""
        bs, num_corr = corr_pos.shape[0], corr_pos.shape[1]
        # the original argument (None = "all valid, statically"): the fused
        # kernels then skip the key-bias stream and its per-element add
        # entirely instead of adding an all-zero row
        mask_arg = mask
        if mask is None:
            mask = jnp.ones((bs, num_corr), dtype=bool)

        # The learned similarity bandwidth (PointDSC.py:97); sigma_d is fixed.
        sigma = self.param("sigma", nn.initializers.ones, (1,), jnp.float32)

        # ---- Step 1: spatial-consistency matrix + correspondence encoding.
        # Computed once, without gradient, shared by all attention layers
        # (PointDSC.py:150-155). src_dist is reused by NMS seed picking.
        # With `fused_attention` the [N, N] compat matrix is never
        # materialized: each attention layer recomputes compatibility tiles
        # in VMEM from the raw coordinates (kernels/sc_attention.py).
        attention_fn = None
        fused_layer_fn = None
        if precomputed_features is not None:
            # encoder ran externally (e.g. row-sharded over a mesh,
            # parallel/seq_parallel.py): no compat matrix is built here and
            # seed NMS uses the tile-wise coordinate kernel (src_dist=None)
            compat = None
            src_dist = None
        elif fused_attention:
            from pointdsc_tpu.kernels.sc_attention import make_sc_attention_fn

            compat_cache = None
            if not train and self.fused_cache_compat:
                # the 12 layers share one compat matrix (PointDSC.py:150-155):
                # materialize it ONCE and stream tiles, instead of recomputing
                # two padded K=3 MXU passes per tile per layer. Stored int8
                # (values are clipped to [0, 1]; scale 127): attention is
                # HBM-bound on this stream, so half of bf16's bytes is ~15%
                # faster at a 1/255 quantization error the softmax cannot
                # see. Built tile-wise in VMEM (no f32 [N, N] intermediate).
                from pointdsc_tpu.kernels.sc_attention import (
                    build_compat_cache_int8,
                )

                compat_cache = build_compat_cache_int8(
                    jax.lax.stop_gradient(src_keypts),
                    jax.lax.stop_gradient(tgt_keypts),
                    self.sigma_d,
                    mask=mask_arg,
                )
            attention_fn = make_sc_attention_fn(
                jax.lax.stop_gradient(src_keypts),
                jax.lax.stop_gradient(tgt_keypts),
                self.sigma_d,
                mask=mask_arg,
                trainable=train,  # custom-VJP kernels when gradients flow
                compat_cache=compat_cache,
                offset_softmax=self.offset_softmax,
            )
            compat = None
            src_dist = None  # NMS runs its own fused kernel; no [N,N] in HBM

            # Whole-layer fusion (kernels/encoder_layer.py): each
            # PointCN+NonLocal pair is ONE kernel (two below
            # MAX_FUSED_LAYER_N, where q/k/v/h stay VMEM-resident; a
            # PointCN+QKV pass plus an attention+MLP+residual pass above
            # it) — activations make at most two HBM round-trips per
            # layer. Gated to eval (BN folding needs running stats), the
            # int8 cache path, and f32 activations.
            if (
                compat_cache is not None
                and not self.half_precision
                and not self.remat
                # the whole-layer kernels implement ONLY the offset
                # softmax; out-of-regime checkpoints keep attention-only
                # fusion with the running-max kernel instead
                and self.offset_softmax
            ):
                from pointdsc_tpu.kernels.encoder_layer import (
                    make_fused_layer_fn,
                )

                fused_layer_fn = make_fused_layer_fn(compat_cache, mask=mask_arg)
        else:
            compat, src_dist = jax.lax.stop_gradient(
                spatial_consistency(
                    src_keypts,
                    tgt_keypts,
                    self.sigma_d,
                    mask=mask,
                    return_src_dist=True,
                )
            )

        encoder_cls = NonLocalNet
        if self.remat:
            # trade FLOPs for HBM during training: each encoder layer's
            # activations are recomputed in the backward pass. `train` and
            # `attention_fn` (positions 4 and 5 counting self) are static:
            # one is a python bool, the other a per-trace closure. Composes
            # with fused attention — the custom-VJP kernel then recomputes
            # its own tiles inside the rematerialized layer.
            encoder_cls = nn.remat(NonLocalNet, static_argnums=(4, 5))
        encoder = encoder_cls(
            in_dim=self.in_dim,
            num_layers=self.num_layers,
            num_channels=self.num_channels,
            attention_fn=self.attention_fn,
            compute_dtype=jnp.bfloat16 if self.half_precision else None,
            name="encoder",
        )
        if precomputed_features is not None:
            corr_features = precomputed_features
        elif self.remat:
            corr_features = encoder(corr_pos, compat, mask, train, attention_fn)
        else:
            corr_features = encoder(
                corr_pos, compat, mask=mask, train=train,
                attention_fn=attention_fn, fused_layer_fn=fused_layer_fn,
            )
        # safe L2 normalize (finite gradient even for a zero feature vector)
        feat_sq = jnp.sum(corr_features * corr_features, axis=-1, keepdims=True)
        normed_features = corr_features / jnp.sqrt(feat_sq + 1e-12)

        # ---- Feature-similarity matrix M (training only; SM-loss target).
        M = (
            None
            if (testing or skip_M)
            else feature_similarity(normed_features, sigma, mask=mask)
        )

        # ---- Step 2: confidence MLP + seed selection.
        # Parameters are declared through holders with nn.Dense's exact tree
        # layout so the fused Pallas head (eval) and the plain jnp math
        # (train / dense path) share the same checkpointable weights.
        from pointdsc_tpu.models.blocks import _DenseParams

        head = {}
        cin = self.num_channels
        for i, cout in enumerate((32, 32, 1)):
            kernel, bias = _DenseParams(cin, cout, name=f"classification_{i}")()
            head[i] = (kernel, bias)
            cin = cout

        if fused_attention and testing and self.num_channels == 128:
            from pointdsc_tpu.kernels.conf_mlp import confidence_head

            confidence = confidence_head(
                corr_features,
                {
                    f"classification_{i}": {"kernel": head[i][0], "bias": head[i][1]}
                    for i in range(3)
                },
            )
        else:
            x = corr_features
            for i in range(2):
                x = nn.relu(x @ head[i][0] + head[i][1])
            confidence = (x @ head[2][0] + head[2][1])[..., 0]

        num_seeds = max(1, int(num_corr * self.ratio))
        if testing:
            if src_dist is None:  # fused path: tile-wise NMS from coordinates
                from pointdsc_tpu.kernels.nms import pick_seeds_nms_prefiltered

                seeds = pick_seeds_nms_prefiltered(
                    jax.lax.stop_gradient(src_keypts), confidence,
                    self.nms_radius, num_seeds, mask=mask,
                )
            else:
                seeds = pick_seeds_nms(
                    src_dist, confidence, self.nms_radius, num_seeds, mask=mask
                )
        else:
            seeds = pick_seeds_topk(confidence, num_seeds, mask=mask)
        seeds = jax.lax.stop_gradient(seeds)

        # ---- Steps 3-4: per-seed NSM -> weighted Procrustes -> best hypothesis.
        seed_trans, seed_fitness, final_trans, final_labels = self._seed_transforms(
            seeds, normed_features, src_keypts, tgt_keypts, sigma, mask,
            fused=fused_attention,
        )

        # ---- Step 5: test-time post refinement.
        if testing:
            # final_labels stay those of the PRE-refinement winning
            # hypothesis: the reference computes them in cal_seed_trans and
            # never relabels after post_refinement (PointDSC.py:182-193) —
            # the eval protocol's precision/recall/F1 columns depend on this
            final_trans = self.post_refinement(
                final_trans, src_keypts, tgt_keypts, mask, fused=fused_attention
            )
        else:
            # training: return confidence logits for the classification loss
            final_labels = confidence

        return PointDSCOutput(
            final_trans=final_trans,
            final_labels=final_labels,
            M=M,
            seed_trans=seed_trans,
            seed_fitness=seed_fitness,
            confidence=confidence,
            normed_features=normed_features,
            sigma=sigma,
        )

    # ------------------------------------------------------------------
    def _seed_transforms(self, seeds, corr_features, src_keypts, tgt_keypts, sigma, mask,
                         fused: bool = False):
        """Neural Spectral Matching + hypothesis selection
        (reference `cal_seed_trans`, PointDSC.py:234-336)."""
        bs, num_corr, _ = corr_features.shape
        k = min(self.k, num_corr - 1)

        # k nearest feature neighbors of the *seed* correspondences only.
        # The reference computes the full [N, N] knn and then gathers the
        # seed rows (PointDSC.py:251-252); only the S = ratio*N seed rows are
        # ever used, so restricting the distance computation and top-k to
        # those rows is mathematically identical and removes the dominant
        # cost of the pipeline (top-k over N rows of length N).
        if self.approx_knn:
            # hardware-accelerated approximate top-k: the NSM spectral
            # weighting is robust to a ~5% neighbor recall loss. XLA fuses
            # the distance einsum into the partial-reduce, so no [S, N]
            # matrix is ever materialized on this path.
            seed_feats = jnp.take_along_axis(
                corr_features, seeds[:, :, None], axis=1
            )  # [B, S, C]
            seed_dist = 2.0 - 2.0 * jnp.einsum(
                "bsc,bnc->bsn", seed_feats, corr_features
            )  # normalized features
            cols = jnp.arange(num_corr)[None, None, :]
            seed_dist = jnp.where(cols == seeds[:, :, None], 1e9, seed_dist)
            seed_dist = jnp.where(mask[:, None, :], seed_dist, 1e9)
            _, knn_idx = jax.lax.approx_max_k(-seed_dist, k, recall_target=0.95)
        elif fused and num_corr >= _SEED_KNN_FUSED_MIN_N and k <= 128:
            # fused EXACT selection (kernels/seed_knn.py): similarity tile
            # on the MXU + in-VMEM per-chunk top-k; the sort-based path
            # below costs ~10 ms at S=2048/N=20480, this ~2 ms
            from pointdsc_tpu.kernels.seed_knn import seed_knn_exact

            knn_idx = seed_knn_exact(corr_features, seeds, k, mask=mask)
        else:
            seed_feats = jnp.take_along_axis(
                corr_features, seeds[:, :, None], axis=1
            )  # [B, S, C]
            seed_dist = 2.0 - 2.0 * jnp.einsum(
                "bsc,bnc->bsn", seed_feats, corr_features
            )
            cols = jnp.arange(num_corr)[None, None, :]
            seed_dist = jnp.where(cols == seeds[:, :, None], 1e9, seed_dist)
            seed_dist = jnp.where(mask[:, None, :], seed_dist, 1e9)
            # hierarchical EXACT selection (ops/knn.py::exact_topk):
            # value-equivalent to a full sort (index set identical except
            # under exact distance ties), ~3.5x cheaper than the flat
            # exact reduction at S=512/N=5120
            from pointdsc_tpu.ops.knn import exact_topk

            knn_idx = exact_topk(-seed_dist, k)  # [B, S, k]

        # ONE wide gather for features+coords+mask instead of four narrow
        # ones: TPU gathers are row-DMA latency-bound, so 3-wide rows cost
        # nearly as much as 134-wide rows
        C = corr_features.shape[-1]
        bundle = jnp.concatenate(
            [
                corr_features,
                src_keypts,
                tgt_keypts,
                mask.astype(corr_features.dtype)[..., None],
            ],
            axis=-1,
        )  # [B, N, C+7]
        flat_idx = knn_idx.reshape(bs, -1)  # [B, S*k]
        g = jnp.take_along_axis(bundle, flat_idx[..., None], axis=1).reshape(
            bs, -1, k, C + 7
        )
        knn_features = g[..., :C]  # [B, S, k, C]
        src_knn = g[..., C:C + 3]  # [B, S, k, 3]
        tgt_knn = g[..., C + 3:C + 6]  # [B, S, k, 3]
        knn_mask = g[..., C + 6] > 0.5  # [B, S, k]
        seed_valid = jnp.take_along_axis(mask, seeds, axis=1)  # [B, S]

        # feature compatibility (learned sigma; clamp at 0 only, PointDSC.py:258-259)
        feat_M = jnp.einsum("bskc,bsjc->bskj", knn_features, knn_features)
        feat_M = jnp.clip(1.0 - (1.0 - feat_M) / (sigma * sigma), 0.0, None)

        # spatial compatibility within the neighborhood (PointDSC.py:266-271).
        # Exact-difference form: the gram expansion loses ~1e-4 to
        # cancellation, amplified by /sigma_d^2. The [B,S,k,k,3] broadcast is
        # fused by XLA (k=40, so it is small anyway).
        def pdist(x):
            diff = x[..., :, None, :] - x[..., None, :, :]
            return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

        spat_diff = pdist(src_knn) - pdist(tgt_knn)
        spat_M = jnp.clip(1.0 - spat_diff**2 / (self.sigma_d**2), 0.0, None)

        total_M = feat_M * spat_M
        total_M = total_M * (1.0 - jnp.eye(k, dtype=total_M.dtype))
        pair_mask = knn_mask[..., :, None] & knn_mask[..., None, :]
        total_M = jnp.where(pair_mask, total_M, 0.0)

        # leading eigenvector -> NSM weights (PointDSC.py:280-282)
        weights = power_iteration(total_M, self.num_iterations)
        weights = jnp.abs(weights) * knn_mask  # eigenvector sign is arbitrary
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-6)

        # weighted Procrustes per seed, all in one batched call
        seed_trans = weighted_procrustes(src_knn, tgt_knn, weights)  # [B, S, 4, 4]

        # hypothesis scoring: count inliers of every seed transform over all
        # correspondences (PointDSC.py:325-335)
        denom = jnp.maximum(jnp.sum(mask, axis=-1), 1)[:, None]
        if fused:
            # tile-wise Pallas counting: nothing [S, N]-shaped in HBM; the
            # best seed's per-point labels are recomputed for that one
            # transform below
            from pointdsc_tpu.kernels.scoring import seed_inlier_counts

            counts = jax.lax.stop_gradient(
                seed_inlier_counts(
                    jax.lax.stop_gradient(seed_trans), src_keypts, tgt_keypts,
                    self.inlier_threshold, mask=mask,
                )
            )  # hypothesis selection is non-differentiable (argmax) anyway
            seed_fitness = counts / denom
            seed_fitness = jnp.where(seed_valid, seed_fitness, -1.0)
            best = jnp.argmax(seed_fitness, axis=-1)  # [B]
            final_trans = jnp.take_along_axis(
                seed_trans, best[:, None, None, None], axis=1
            )[:, 0]
            warped = transform(src_keypts, final_trans)
            best_dis = jnp.linalg.norm(warped - tgt_keypts, axis=-1)
        else:
            pred = jnp.einsum(
                "bsij,bnj->bsni", seed_trans[:, :, :3, :3], src_keypts
            ) + seed_trans[:, :, None, :3, 3]
            L2_dis = jnp.linalg.norm(pred - tgt_keypts[:, None], axis=-1)  # [B, S, N]
            inlier = (L2_dis < self.inlier_threshold) & mask[:, None, :]
            seed_fitness = jnp.sum(inlier, axis=-1) / denom  # [B, S]
            seed_fitness = jnp.where(seed_valid, seed_fitness, -1.0)
            best = jnp.argmax(seed_fitness, axis=-1)  # [B]
            final_trans = jnp.take_along_axis(
                seed_trans, best[:, None, None, None], axis=1
            )[:, 0]
            best_dis = jnp.take_along_axis(L2_dis, best[:, None, None], axis=1)[:, 0]
        final_labels = ((best_dis < self.inlier_threshold) & mask).astype(jnp.float32)
        return seed_trans, seed_fitness, final_trans, final_labels

    # ------------------------------------------------------------------
    def post_refinement(self, initial_trans, src_keypts, tgt_keypts, mask,
                        fused: bool = False):
        """Iteratively re-weighted refinement (reference PointDSC.py:403-438).

        Up to `refine_iters` rounds of {warp, threshold inliers, re-fit with
        Geman-McClure-style weights 1/(1+(d/tau)^2)}; a sample freezes once
        its inlier count stops changing, matching the reference early break.
        Boolean indexing becomes zero-weighting, which is mathematically
        identical for the weighted Procrustes fit.

        With `fused` (the TPU fast path, enabled alongside fused attention)
        each iteration's point-loop reduction runs as one Pallas kernel
        (kernels/refine.py) instead of ~a dozen small XLA ops.
        """
        # reference uses 1.2 for KITTI-config models (inlier_threshold != 0.10)
        thr = 0.10 if self.inlier_threshold == 0.10 else 1.2

        if fused and self.refine_iters > 0:
            from pointdsc_tpu.kernels.refine import fused_post_refinement

            return fused_post_refinement(
                initial_trans, src_keypts, tgt_keypts, mask, thr,
                self.refine_iters,
            )

        def body(state):
            trans, prev_num, active, it = state
            warped = transform(src_keypts, trans)
            dist = jnp.linalg.norm(warped - tgt_keypts, axis=-1)  # [B, N]
            inlier = (dist < thr) & mask
            num = jnp.sum(inlier, axis=-1).astype(jnp.int32)
            changed = jnp.abs(num - prev_num) >= 1
            w = inlier.astype(dist.dtype) / (1.0 + (dist / thr) ** 2)
            new_trans = weighted_procrustes(src_keypts, tgt_keypts, w)
            still = active & changed
            trans = jnp.where(still[:, None, None], new_trans, trans)
            return trans, num, still, it + 1

        def cond(state):
            _, _, active, it = state
            return jnp.any(active) & (it < self.refine_iters)

        bs = initial_trans.shape[0]
        state = (
            initial_trans,
            jnp.zeros((bs,), jnp.int32),
            jnp.ones((bs,), bool),
            jnp.asarray(0, jnp.int32),
        )
        trans, _, _, _ = jax.lax.while_loop(cond, body, state)
        return trans
