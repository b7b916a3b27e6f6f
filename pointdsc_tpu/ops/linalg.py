"""Small symmetric eigensolvers for TPU: branch-free cyclic Jacobi.

The reference computes 3x3 SVDs on the *host CPU* because batched small SVDs
were slow on GPU (/root/reference/models/common.py:36, justified by
/root/reference/misc/svd_speed.py). On TPU we instead solve the tiny
symmetric eigenproblems fully on device with a fixed number of Jacobi sweeps:
no host round-trip, fully batched, differentiable, and branch-free so XLA
compiles it to straight-line vector code.

Used for:
  * Horn quaternion Procrustes (leading eigenvector of a 4x4, procrustes.py)
  * surface-normal estimation (smallest eigenvector of a 3x3 covariance)
"""

from __future__ import annotations

import jax.numpy as jnp


def _jacobi_rotation_pair(A: jnp.ndarray, V: jnp.ndarray, p: int, q: int):
    """One batched Jacobi rotation zeroing A[..., p, q] (p < q, static).

    Branch-free: when |A_pq| is negligible the rotation reduces to identity.
    """
    n = A.shape[-1]
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]

    # t = tan(theta) is the smaller-magnitude root of t^2 + 2 tau t - 1 = 0
    # with tau = (aqq - app) / (2 apq). The textbook form
    # sign(tau)/(|tau| + sqrt(1 + tau^2)) divides by apq, whose square
    # underflows in f32 and poisons the backward pass with 0 * inf = NaN.
    # Multiplying through by 2|apq| gives the equivalent, division-safe
    #     t = 2 apq sign(d) / (|d| + hypot(2 apq, d)),   d = aqq - app,
    # which is smooth, bounded (|t| <= 1), never divides by a vanishing
    # quantity (the tiny additive term bounds the denominator away from 0),
    # and naturally yields t = 0 when apq = 0 and t = +-1 (45 degrees) when
    # d = 0. Gradients are finite everywhere.
    d = aqq - app
    sgn_d = jnp.where(d >= 0, 1.0, -1.0)
    hyp = jnp.sqrt(4.0 * apq * apq + d * d + 1e-36)
    t = 2.0 * apq * sgn_d / (jnp.abs(d) + hyp)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    # Build the Givens matrix G (identity except at (p,p),(q,q),(p,q),(q,p)).
    G = jnp.zeros_like(A) + jnp.eye(n, dtype=A.dtype)
    G = G.at[..., p, p].set(c)
    G = G.at[..., q, q].set(c)
    G = G.at[..., p, q].set(s)
    G = G.at[..., q, p].set(-s)

    A_new = jnp.swapaxes(G, -1, -2) @ A @ G
    V_new = V @ G
    # Exactly zero the eliminated off-diagonal entry for numerical hygiene.
    A_new = A_new.at[..., p, q].set(0.0)
    A_new = A_new.at[..., q, p].set(0.0)
    return A_new, V_new


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 10):
    """Eigendecomposition of small batched symmetric matrices via cyclic Jacobi.

    Args:
        A:      [..., n, n] symmetric (n expected to be tiny: 3 or 4).
        sweeps: number of full cyclic sweeps (each sweep visits all n(n-1)/2
                off-diagonal pairs). 10 sweeps drive 3x3/4x4 matrices to
                machine precision.

    Returns:
        (eigvals [..., n] ascending, eigvecs [..., n, n] with columns as
        eigenvectors, i.e. A @ v[..., :, i] = w[..., i] * v[..., :, i]).
    """
    n = A.shape[-1]
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    V = jnp.zeros_like(A) + jnp.eye(n, dtype=A.dtype)
    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]
    for _ in range(sweeps):
        for p, q in pairs:
            A, V = _jacobi_rotation_pair(A, V, p, q)

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def symeig3x3(A: jnp.ndarray, sweeps: int = 8):
    """Eigendecomposition of batched symmetric 3x3 matrices (ascending)."""
    assert A.shape[-1] == 3 and A.shape[-2] == 3
    return jacobi_eigh(A, sweeps=sweeps)


def symeig4x4(A: jnp.ndarray, sweeps: int = 10):
    """Eigendecomposition of batched symmetric 4x4 matrices (ascending)."""
    assert A.shape[-1] == 4 and A.shape[-2] == 4
    return jacobi_eigh(A, sweeps=sweeps)
