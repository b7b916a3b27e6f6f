"""SO(3)/SE(3) exponential and logarithm maps (batched, Taylor-safe).

Foundation for the pose-graph optimizer (multiway registration). The
reference delegates all of this to Open3D's C++ global optimization
(/root/reference/multiway/optimize_posegraph.py:33-42); here the maps are
pure JAX so the whole pose-graph Gauss-Newton iteration jits.

Conventions: twists are [rx, ry, rz, tx, ty, tz] (rotation first); matrices
act on column vectors; exp/log are exact with Taylor fallbacks near 0 and
pi, all branch-free via `where`.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    # safe-where pattern: the UNTAKEN branch is still differentiated, so it
    # must be evaluated at a benign theta (1.0), not at ~0 where the f32
    # quotient derivatives underflow/divide-by-zero
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = skew(w)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.zeros_like(K) + jnp.eye(3, dtype=w.dtype)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle (|w| in [0, pi])."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    # strict interior clamp: arccos' is infinite at +-1, which would inject
    # NaN into Jacobians of zero-residual (identity) edges; the value error
    # introduced (theta floor ~4.5e-4 whose scale factor differs from the
    # true one by < 2e-8) is far below f32 noise.
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(theta)
    small = theta < 1e-4
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,  # theta/(2 sin) series
        theta / (2.0 * jnp.where(small, 1.0, sin) + _EPS),
    )
    w = vee * scale[..., None]
    # near pi the vee part vanishes; recover the axis from diag(R).
    # sqrt(x + tiny) keeps gradients finite when this (unselected) branch is
    # evaluated at axis_sq = 0 -- a bare sqrt(0) would poison the backward
    # pass through the `where` below with 0 * inf = NaN.
    near_pi = theta > 3.1
    axis_sq = jnp.clip((jnp.diagonal(R, axis1=-2, axis2=-1) - cos[..., None]) /
                       jnp.clip(1.0 - cos[..., None], 1e-8, None), 0.0, None)
    axis = jnp.sqrt(axis_sq + 1e-12)
    # fix signs using off-diagonal sums
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    # at exactly pi the vee signs are 0; use products with the dominant axis
    signs = jnp.stack([sx, sy, sz], axis=-1)
    w_pi = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def _V_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3): V such that exp-translation t = V rho.

    Same safe-where discipline as so3_exp: the quotient branch is evaluated
    at theta=1 when the series branch is selected. Without it, the f32
    derivative of (theta - sin)/theta^3 at theta ~ 1e-8 underflows
    (denominator^2 ~ 1e-48) and poisons every downstream pose-graph
    Jacobian with NaN.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = skew(w)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    eye = jnp.zeros_like(K) + jnp.eye(3, dtype=w.dtype)
    return eye + B[..., None, None] * K + C[..., None, None] * (K @ K)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] twist (w, rho) -> [..., 4, 4] transform."""
    w, rho = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_V_matrix(w) @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] transform -> [..., 6] twist (w, rho)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    V = _V_matrix(w)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([w, rho], axis=-1)
