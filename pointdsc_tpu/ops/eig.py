"""Leading-eigenvector power iteration (the Neural Spectral Matching core).

Mirrors /root/reference/models/PointDSC.py:338-364 (`cal_leading_eigenvector`,
method='power'). The reference early-exits when two iterates are allclose;
on TPU we run the fixed iteration count inside `lax.fori_loop` -- for the
default 10 iterations on k x k (k=40) matrices the early exit saves nothing
and a static loop keeps the program free of host synchronization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def power_iteration(
    M: jnp.ndarray, num_iters: int = 10, eps: float = 1e-6
) -> jnp.ndarray:
    """Approximate leading eigenvector of batched symmetric nonneg matrices.

    Args:
        M:         [..., n, n] compatibility matrices (entries >= 0).
        num_iters: fixed iteration count.

    Returns:
        [..., n] leading eigenvector, normalized to unit L2 norm (same
        normalization as the reference: v / (||v|| + eps)).
    """
    v0 = jnp.ones(M.shape[:-1] + (1,), dtype=M.dtype)

    def _unit(v):
        # sqrt(sum + tiny) keeps the gradient finite when M is all-zero
        # (e.g. a fully-outlier seed neighborhood): jnp.linalg.norm has a
        # NaN gradient at exactly 0.
        norm = jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True) + 1e-30)
        return v / (norm + eps)

    n = M.shape[-1]
    if n > 128:
        # Full-matrix callers (the classical SM baseline runs N up to 20k):
        # a matvec is O(n^2) but a squaring is O(n^3), so the binary-
        # exponentiation trick below would cost ~n/log(k) times MORE here.
        # Keep the serialized matvecs.
        def body(_, v):
            return _unit(M @ v)

        v = jax.lax.fori_loop(0, num_iters, body, v0)
        return v[..., 0]

    # Small matrices (the NSM's k x k neighborhoods, batched over all
    # seeds): a batched [B, n, n] dot pads the n=40 lane axis to 128 and
    # runs the MXU at ~3% utilization — measured 3.5 ms for 10 iterations
    # on [2048, 40, 40] (the dominant cost of the whole NSM mid-section at
    # N = 20480). Moving the BATCH onto the lane axis makes each matvec an
    # elementwise multiply + an n-long sublane reduction in a perfectly
    # tiled [n, n, B] layout — pure VPU, no padding, ~0.2 ms for the same
    # problem. (This replaces the round-2 binary-exponentiation squaring
    # trick, whose [B, n, n] squarings paid the same padded-lane tax.)
    bshape = M.shape[:-2]
    b = 1
    for d in bshape:
        b *= d
    Mt = jnp.moveaxis(M.reshape((b,) + M.shape[-2:]), 0, -1)  # [n, n, B]
    v = jnp.ones((1, n, b), dtype=M.dtype)

    def body(_, v):
        w = jnp.sum(Mt * v, axis=1)  # [n, B]: w_i = sum_j M_ij v_j
        norm = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True) + 1e-30)
        return (w / (norm + eps))[None]  # [1, n, B], broadcastable vs Mt

    v = jax.lax.fori_loop(0, num_iters, body, v)
    return jnp.moveaxis(v[0], -1, 0).reshape(bshape + (n,))


def rayleigh_quotient(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rayleigh quotient v^T M v / v^T v (the reference's confidence measure,
    PointDSC.py:375-379)."""
    Mv = jnp.einsum("...nm,...m->...n", M, v)
    return jnp.einsum("...n,...n->...", v, Mv) / (
        jnp.einsum("...n,...n->...", v, v) + 1e-12
    )
