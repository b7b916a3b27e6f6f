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

    def body(_, v):
        v = M @ v
        # sqrt(sum + tiny) keeps the gradient finite when M is all-zero
        # (e.g. a fully-outlier seed neighborhood): jnp.linalg.norm has a
        # NaN gradient at exactly 0.
        norm = jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True) + 1e-30)
        return v / (norm + eps)

    v = jax.lax.fori_loop(0, num_iters, body, v0)
    return v[..., 0]


def rayleigh_quotient(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rayleigh quotient v^T M v / v^T v (the reference's confidence measure,
    PointDSC.py:375-379)."""
    Mv = jnp.einsum("...nm,...m->...n", M, v)
    return jnp.einsum("...n,...n->...", v, Mv) / (
        jnp.einsum("...n,...n->...", v, v) + 1e-12
    )
