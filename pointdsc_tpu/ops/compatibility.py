"""Pairwise compatibility matrices (spatial consistency + feature similarity).

Mirrors /root/reference/models/PointDSC.py:150-153 (spatial consistency,
computed once per pair and reused by every attention layer) and :158-163
(the learned-sigma feature similarity matrix M used by the SM loss).

Distances use the matmul expansion so the O(N^2) work runs on the MXU and no
[N, N, 3] broadcast is materialized in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp

from pointdsc_tpu.ops.knn import pairwise_dists_exact


def spatial_consistency(
    src_keypts: jnp.ndarray,
    tgt_keypts: jnp.ndarray,
    sigma_d: float | jnp.ndarray,
    mask: jnp.ndarray | None = None,
    return_src_dist: bool = False,
):
    """Spatial-consistency matrix: clamp(1 - (|d_src - d_tgt|)^2 / sigma_d^2, 0).

    Args:
        src_keypts, tgt_keypts: [..., N, 3].
        sigma_d: length-consistency bandwidth (sigma_spat in the reference).
        mask: optional [..., N]; invalid rows/cols are zeroed.

    Returns:
        compat [..., N, N]; optionally also the src distance matrix (reused
        by NMS seed selection, as in the reference forward pass).
    """
    # exact-difference distances: the gram-form expansion loses ~1e-4 to
    # cancellation, amplified 100x by /sigma_d^2 (sigma_d=0.1) and then
    # layer-by-layer through the encoder
    src_dist = pairwise_dists_exact(src_keypts)
    tgt_dist = pairwise_dists_exact(tgt_keypts)
    diff = src_dist - tgt_dist
    compat = jnp.clip(1.0 - diff * diff / (sigma_d * sigma_d), 0.0, None)
    if mask is not None:
        pair_mask = mask[..., :, None] & mask[..., None, :]
        compat = jnp.where(pair_mask, compat, 0.0)
    if return_src_dist:
        return compat, src_dist
    return compat


def feature_similarity(
    feats: jnp.ndarray,
    sigma: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Feature-similarity matrix M = clamp(1 - (1 - f_i . f_j) / sigma^2, 0, 1)
    with zero diagonal (reference PointDSC.py:158-163). `sigma` is the
    learned scalar parameter.

    Args:
        feats: [..., N, C] L2-normalized features.
    """
    inner = jnp.einsum("...nc,...mc->...nm", feats, feats)
    M = jnp.clip(1.0 - (1.0 - inner) / (sigma * sigma), 0.0, 1.0)
    n = feats.shape[-2]
    M = M * (1.0 - jnp.eye(n, dtype=M.dtype))
    if mask is not None:
        pair_mask = mask[..., :, None] & mask[..., None, :]
        M = jnp.where(pair_mask, M, 0.0)
    return M
