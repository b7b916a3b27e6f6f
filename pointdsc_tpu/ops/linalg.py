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


def _det3_of(m, rows, cols):
    """3x3 determinant of the submatrix m[..., rows, cols] (static indices)."""
    r0, r1, r2 = rows
    c0, c1, c2 = cols
    a, b, c = m[..., r0, c0], m[..., r0, c1], m[..., r0, c2]
    d, e, f = m[..., r1, c0], m[..., r1, c1], m[..., r1, c2]
    g, h, i = m[..., r2, c0], m[..., r2, c1], m[..., r2, c2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _det4(m):
    """Determinant of batched 4x4 matrices by cofactor expansion (row 0)."""
    cols = (0, 1, 2, 3)
    out = 0.0
    sign = 1.0
    for j in range(4):
        rest = tuple(c for c in cols if c != j)
        out = out + sign * m[..., 0, j] * _det3_of(m, (1, 2, 3), rest)
        sign = -sign
    return out


def _adjugate4_sym(m):
    """Adjugate of batched *symmetric* 4x4 matrices.

    adj(A)_ij = (-1)^(i+j) * minor_ji; for symmetric A the adjugate is
    symmetric, so only the upper triangle is computed. All straight-line
    elementwise math — XLA fuses the whole thing into one kernel.
    """
    idx = (0, 1, 2, 3)
    entries = {}
    for i in range(4):
        for j in range(i, 4):
            rows = tuple(r for r in idx if r != j)
            cols = tuple(c for c in idx if c != i)
            entries[(i, j)] = ((-1.0) ** (i + j)) * _det3_of(m, rows, cols)
    rows_out = []
    for i in range(4):
        row = [entries[(min(i, j), max(i, j))] for j in range(4)]
        rows_out.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows_out, axis=-2)


def dominant_eigvec4x4(A: jnp.ndarray, newton_iters: int = 14):
    """Largest eigenvalue + eigenvector of batched symmetric 4x4 matrices,
    closed form: Newton on the characteristic quartic, eigenvector from the
    adjugate of (A - lambda I).

    Unlike `jacobi_eigh` (60 sequential Givens rotations), this is pure
    unrolled elementwise math that XLA fuses into a handful of vector ops —
    the difference matters inside sequential loops (post-refinement runs a
    4x4 eigensolve per iteration; Horn Procrustes at /root/reference/
    models/common.py:36 did this on the host CPU via SVD).

    Method: shift by trace/4 so B is traceless, scale by ||B||_F so entries
    are O(1); then p(x) = x^4 - tr(B^2)/2 x^2 - tr(B^3)/3 x + det(B).
    x0 = 1 = ||B||_F >= lambda_max bounds the largest root from above, and
    Newton from above a quartic's largest root converges monotonically
    (p, p' > 0 on that side). The adjugate of the rank-3 matrix B - lambda I
    is s*v v^T, so its largest-diagonal column is the eigenvector.

    Returns (eigval [...], eigvec [..., 4] unit norm). Differentiable
    (straight-line ops only). Degenerate inputs (multiple largest
    eigenvalue, zero matrix) fall back to e0 = (1, 0, 0, 0).
    """
    assert A.shape[-1] == 4 and A.shape[-2] == 4
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    mu = jnp.trace(A, axis1=-2, axis2=-1) / 4.0
    eye = jnp.eye(4, dtype=A.dtype)
    B = A - mu[..., None, None] * eye
    fro = jnp.sqrt(jnp.sum(B * B, axis=(-1, -2)))
    scale = jnp.maximum(fro, jnp.asarray(1e-30, A.dtype))
    Bn = B / scale[..., None, None]

    # invariants of the (traceless, unit-Frobenius) Bn
    B2 = Bn @ Bn
    tr2 = jnp.trace(B2, axis1=-2, axis2=-1)  # == 1 up to rounding
    e3 = jnp.sum(B2 * Bn, axis=(-1, -2)) / 3.0  # tr(Bn^3)/3 (Bn symmetric)
    e4 = _det4(Bn)
    c2 = -0.5 * tr2

    lam = jnp.ones_like(tr2)
    for _ in range(newton_iters):
        lam2 = lam * lam
        p = lam2 * lam2 + c2 * lam2 - e3 * lam + e4
        dp = 4.0 * lam2 * lam + 2.0 * c2 * lam - e3
        lam = lam - p / jnp.maximum(dp, jnp.asarray(1e-12, A.dtype))

    C = Bn - lam[..., None, None] * eye
    adj = _adjugate4_sym(C)
    diag = jnp.abs(jnp.diagonal(adj, axis1=-2, axis2=-1))  # s * v_i^2
    col = jnp.argmax(diag, axis=-1)
    v = jnp.take_along_axis(adj, col[..., None, None], axis=-1)[..., 0]
    nv = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    tiny = jnp.asarray(1e-20, A.dtype)
    v = jnp.where(nv > tiny, v / jnp.maximum(nv, tiny), fallback)
    return lam * scale + mu, v
