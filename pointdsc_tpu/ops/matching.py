"""On-device descriptor matching and ground-truth labeling.

The reference builds putative correspondences on the host inside dataloader
workers (numpy argmin over a 5000 x 5000 descriptor distance matrix,
/root/reference/datasets/ThreeDMatch.py:110-129). Here the same construction
is a TPU op: one matmul + argmin, so correspondence building fuses into the
same XLA program as the model forward when desired.

Static-shape discipline: with `use_mutual` the reference produces a variable
number of correspondences and clips batches to the minimum
(/root/reference/datasets/dataloader.py:6-31). We instead always return one
correspondence per source point plus a validity mask (mutual check failures
are masked out, not dropped), keeping every shape static.
"""

from __future__ import annotations

import jax.numpy as jnp

from pointdsc_tpu.ops.se3 import transform


def match_descriptors(
    src_desc: jnp.ndarray,
    tgt_desc: jnp.ndarray,
    use_mutual: bool = False,
):
    """Nearest-neighbor correspondences in descriptor space.

    Args:
        src_desc: [N, C] L2-normalized source descriptors.
        tgt_desc: [M, C] L2-normalized target descriptors.
        use_mutual: apply the mutual-nearest-neighbor check.

    Returns:
        (corr [N, 2] int32 (src_idx, tgt_idx), corr_mask [N] bool).
        With use_mutual=False the mask is all-True (reference returns all N).
    """
    # distance = sqrt(2 - 2 s.t + 1e-6), same as ThreeDMatch.py:111 -- but the
    # argmin only needs the inner product ordering, so skip the sqrt.
    inner = src_desc @ tgt_desc.T  # [N, M]
    src_to_tgt = jnp.argmax(inner, axis=1)
    n = src_desc.shape[0]
    src_ids = jnp.arange(n, dtype=jnp.int32)
    corr = jnp.stack([src_ids, src_to_tgt.astype(jnp.int32)], axis=-1)
    if use_mutual:
        tgt_to_src = jnp.argmax(inner, axis=0)
        mutual = tgt_to_src[src_to_tgt] == src_ids
        return corr, mutual
    return corr, jnp.ones((n,), dtype=bool)


def inlier_labels(
    src_keypts: jnp.ndarray,
    tgt_keypts: jnp.ndarray,
    gt_trans: jnp.ndarray,
    inlier_threshold: float,
) -> jnp.ndarray:
    """Ground-truth inlier labels: ||T(src) - tgt|| < tau
    (reference ThreeDMatch.py:124-129).

    Args:
        src_keypts, tgt_keypts: [..., N, 3] matched keypoints.
        gt_trans: [..., 4, 4].

    Returns:
        [..., N] float32 labels in {0, 1}.
    """
    warped = transform(src_keypts, gt_trans)
    dist = jnp.linalg.norm(warped - tgt_keypts, axis=-1)
    return (dist < inlier_threshold).astype(jnp.float32)
