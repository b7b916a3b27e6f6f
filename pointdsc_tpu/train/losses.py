"""Losses and metrics (masked, fully on device).

Rebuilds /root/reference/libs/loss.py with three changes driven by TPU
execution:
  * everything is branch-free and masked (no boolean indexing, no per-sample
    python loops) so a whole batch is one fused XLA computation;
  * the sklearn precision/recall/F1 host round-trip (loss.py:97-100) becomes
    an on-device confusion-matrix computation;
  * scalars stay in DeviceArrays; hosts only see them at logging time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pointdsc_tpu.ops.se3 import decompose_trans, transform


def _masked_mean(x, mask, axis=None, eps=1e-12):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / (jnp.sum(m, axis=axis) + eps)


def classification_loss(
    logits: jnp.ndarray,
    gt_labels: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    balanced: bool = False,
) -> jnp.ndarray:
    """BCE-with-logits over correspondences (reference loss.py:85-93).

    `balanced` weights positives by num_neg/num_pos computed over the whole
    (masked) batch, exactly like the torch `pos_weight` path.
    """
    if mask is None:
        mask = jnp.ones_like(logits, dtype=bool)
    m = mask.astype(logits.dtype)
    gt = gt_labels.astype(logits.dtype)

    # numerically stable BCE with logits
    per = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if balanced:
        num_pos = jnp.maximum(jnp.sum(gt * m) - 1, 0.0) + 1.0
        num_neg = jnp.maximum(jnp.sum((1 - gt) * m) - 1, 0.0) + 1.0
        pos_weight = num_neg / num_pos
        # torch BCEWithLogitsLoss(pos_weight): loss = -[pw*y*log(s) + (1-y)*log(1-s)]
        log_sig = -(jnp.maximum(-logits, 0) + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        log_one_minus = -(jnp.maximum(logits, 0) + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        per = -(pos_weight * gt * log_sig + (1 - gt) * log_one_minus)
    return _masked_mean(per, mask)


def classification_metrics(
    logits: jnp.ndarray, gt_labels: jnp.ndarray, mask: jnp.ndarray | None = None
):
    """Inlier precision / recall / F1 and mean logits, on device.

    The reference computes these with sklearn on sample 0 only
    (loss.py:97-102); we compute them over all valid entries of the batch.
    """
    if mask is None:
        mask = jnp.ones_like(logits, dtype=bool)
    m = mask.astype(logits.dtype)
    gt = gt_labels.astype(logits.dtype)
    pred = (logits > 0).astype(logits.dtype)

    tp = jnp.sum(pred * gt * m)
    fp = jnp.sum(pred * (1 - gt) * m)
    fn = jnp.sum((1 - pred) * gt * m)
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    logit_true = jnp.sum(logits * gt * m) / jnp.maximum(jnp.sum(gt * m), 1.0)
    logit_false = jnp.sum(logits * (1 - gt) * m) / jnp.maximum(
        jnp.sum((1 - gt) * m), 1.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "logit_true": logit_true,
        "logit_false": logit_false,
    }


def spectral_matching_loss(
    M: jnp.ndarray,
    gt_labels: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    balanced: bool = True,
) -> jnp.ndarray:
    """MSE between the feature-similarity matrix M and the gt inlier
    outer-product matrix, diagonal excluded (reference loss.py:120-139)."""
    b, n = gt_labels.shape
    if mask is None:
        mask = jnp.ones((b, n), dtype=bool)
    # The diagonal stays IN pair_mask: both M (model) and gt_M (below) have a
    # zero diagonal, so it contributes nothing to the numerators but the
    # reference counts its N entries in every denominator (loss.py:135,138).
    pair_mask = (mask[:, :, None] & mask[:, None, :]).astype(M.dtype)

    gt = gt_labels.astype(M.dtype)
    gt_M = gt[:, None, :] * gt[:, :, None]  # == ((li + lj) == 2)
    gt_M = gt_M * pair_mask * (1.0 - jnp.eye(n, dtype=M.dtype))

    if balanced:
        sq_p = ((M - 1.0) ** 2) * gt_M
        sq_n = (M**2) * (1.0 - gt_M) * pair_mask
        denom_p = jnp.maximum(jnp.sum(gt_M, axis=(1, 2)) - 1.0, 0.0) + 1.0
        denom_n = (
            jnp.maximum(jnp.sum((1.0 - gt_M) * pair_mask, axis=(1, 2)) - 1.0, 0.0) + 1.0
        )
        loss_p = jnp.sum(sq_p, axis=(1, 2)) / denom_p
        loss_n = jnp.sum(sq_n, axis=(1, 2)) / denom_n
        return jnp.mean(0.5 * loss_p + 0.5 * loss_n)
    per = ((M - gt_M) ** 2) * pair_mask
    return jnp.sum(per) / jnp.maximum(jnp.sum(pair_mask), 1.0)


class TransformationLossOutput(NamedTuple):
    loss: jnp.ndarray
    recall: jnp.ndarray  # percentage in [0, 100]
    re: jnp.ndarray  # degrees (batch mean)
    te: jnp.ndarray  # centimeters (batch mean)
    rmse: jnp.ndarray


def transformation_loss(
    trans: jnp.ndarray,
    gt_trans: jnp.ndarray,
    src_keypts: jnp.ndarray,
    tgt_keypts: jnp.ndarray,
    probs: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    re_thre: float = 15.0,
    te_thre: float = 30.0,
) -> TransformationLossOutput:
    """Transformation loss + registration metrics (reference loss.py:18-63),
    vectorized over the batch.

    loss per sample = mean squared residual of warped correspondences, but
    only when at least one predicted inlier exists (probs > 0), else 0.
    """
    if mask is None:
        mask = jnp.ones(src_keypts.shape[:2], dtype=bool)

    R, t = decompose_trans(trans)
    gt_R, gt_t = decompose_trans(gt_trans)

    tr = jnp.trace(jnp.swapaxes(R, -1, -2) @ gt_R, axis1=-2, axis2=-1)
    re = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    te = jnp.sqrt(jnp.sum((t - gt_t) ** 2, axis=(-2, -1))) * 100.0

    warped = transform(src_keypts, trans)
    resid_sq = jnp.sum((warped - tgt_keypts) ** 2, axis=-1)  # [B, N]
    rmse = _masked_mean(jnp.sqrt(resid_sq), mask, axis=-1)  # [B]

    recall = jnp.mean(((re < re_thre) & (te < te_thre)).astype(jnp.float32)) * 100.0

    has_inlier = jnp.any((probs > 0) & mask, axis=-1)
    per_sample = _masked_mean(resid_sq, mask, axis=-1)
    loss = jnp.mean(jnp.where(has_inlier, per_sample, 0.0))

    return TransformationLossOutput(
        loss=loss,
        recall=recall,
        re=jnp.mean(re),
        te=jnp.mean(te),
        rmse=jnp.mean(rmse),
    )
