"""Seed selection: matrix-parallel NMS (test) and top-k (train).

Mirrors /root/reference/models/PointDSC.py:199-232 (`pick_seeds`) and the
train-time top-ratio argsort (PointDSC.py:176). The reference NMS is already
matrix-parallel, so it maps directly onto the VPU; we add masking so padded
correspondences are never selected and never suppress real ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def pick_seeds_nms(
    dists: jnp.ndarray,
    scores: jnp.ndarray,
    radius: float,
    max_num: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Non-maximum-suppression seed picking (batched).

    A correspondence i is a local max iff for every j either
    score[i] >= score[j] or dist(i, j) >= radius. Seeds are the top `max_num`
    by score * is_local_max -- replicated exactly from the reference,
    including the quirk that suppressed points (key 0) can outrank local
    maxima with negative scores.

    Args:
        dists:  [..., N, N] src keypoint distance matrix.
        scores: [..., N] confidence logits.
        radius: NMS radius.
        max_num: number of seeds to return (static).
        mask:   optional [..., N] validity; invalid entries sort last and do
                not suppress valid ones.

    Returns:
        [..., max_num] int32 seed indices.
    """
    if mask is not None:
        # Invalid points must not suppress anyone: treat them as far away.
        dists = jnp.where(mask[..., None, :], dists, jnp.inf)
        scores_cmp = jnp.where(mask, scores, _NEG)
    else:
        scores_cmp = scores

    score_relation = scores_cmp[..., :, None] >= scores_cmp[..., None, :]
    free = score_relation | (dists >= radius)
    is_local_max = jnp.min(free.astype(scores.dtype), axis=-1)

    key = scores * is_local_max
    if mask is not None:
        key = jnp.where(mask, key, -jnp.inf)
    _, idx = jax.lax.top_k(key, max_num)
    return idx


def pick_seeds_topk(
    scores: jnp.ndarray, max_num: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Train-time seed picking: plain top-`max_num` by confidence
    (reference PointDSC.py:176)."""
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, max_num)
    return idx
