"""SE(3) rigid-transform utilities (batched, pure JAX).

Provides the same capabilities as the reference SE(3) helpers
(/root/reference/utils/SE3.py:43-112): apply / compose / decompose 4x4
transforms, plus rotation/translation error metrics used by the losses and
the evaluation protocol (/root/reference/libs/loss.py:44-49).

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform(pts: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) transform(s): out = R @ p + t.

    Args:
        pts:   [..., N, 3] points.
        trans: [..., 4, 4] transform, leading dims broadcast against pts.

    Returns:
        [..., N, 3] transformed points.
    """
    R = trans[..., :3, :3]
    t = trans[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def integrate_trans(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble [..., 4, 4] SE(3) matrices from R [..., 3, 3] and t.

    `t` may be [..., 3], [..., 3, 1] or [..., 1, 3].
    """
    t = jnp.reshape(t, R.shape[:-2] + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def decompose_trans(trans: jnp.ndarray):
    """Split [..., 4, 4] into (R [..., 3, 3], t [..., 3, 1])."""
    return trans[..., :3, :3], trans[..., :3, 3:4]


def concatenate_trans(trans1: jnp.ndarray, trans2: jnp.ndarray) -> jnp.ndarray:
    """Compose two SE(3) transforms: returns trans1 @ trans2."""
    R1, t1 = decompose_trans(trans1)
    R2, t2 = decompose_trans(trans2)
    return integrate_trans(R1 @ R2, R1 @ t2 + t1)


def inverse_trans(trans: jnp.ndarray) -> jnp.ndarray:
    """Invert SE(3) transform(s) without a general matrix inverse."""
    R, t = decompose_trans(trans)
    Rt = jnp.swapaxes(R, -1, -2)
    return integrate_trans(Rt, -(Rt @ t))


def relative_rotation_error(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees: acos((tr(Rp^T Rg) - 1) / 2).

    Mirrors the RE metric of the reference transformation loss
    (/root/reference/libs/loss.py:44).
    """
    tr = jnp.trace(jnp.swapaxes(R_pred, -1, -2) @ R_gt, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def relative_translation_error(t_pred: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """Translation error in centimeters (reference reports TE * 100)."""
    d = jnp.sqrt(jnp.sum((t_pred - t_gt) ** 2, axis=(-2, -1)))
    return d * 100.0


def random_rotation(key: jax.Array, num_axis: int, magnitude: float) -> jnp.ndarray:
    """Sample a random rotation for augmentation (on-device analog of
    /root/reference/utils/SE3.py:5-30).

    num_axis: 0 -> identity, 1 -> a single randomly chosen principal axis,
    3 -> composition Rx @ Ry @ Rz. Angles are U[0, 2*pi*magnitude).
    """
    if num_axis == 0:
        return jnp.eye(3)
    k_ang, k_choice = jax.random.split(key)
    angles = jax.random.uniform(k_ang, (3,)) * 2.0 * jnp.pi * magnitude
    c, s = jnp.cos(angles), jnp.sin(angles)
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, c[0], -s[0]], [0.0, s[0], c[0]]])
    Ry = jnp.array([[c[1], 0.0, s[1]], [0.0, 1.0, 0.0], [-s[1], 0.0, c[1]]])
    Rz = jnp.array([[c[2], -s[2], 0.0], [s[2], c[2], 0.0], [0.0, 0.0, 1.0]])
    if num_axis == 1:
        idx = jax.random.randint(k_choice, (), 0, 3)
        return jax.lax.switch(idx, [lambda: Rx, lambda: Ry, lambda: Rz])
    return Rx @ Ry @ Rz


def random_translation(key: jax.Array, magnitude: float) -> jnp.ndarray:
    """Sample a random translation in [0, magnitude)^3 (SE3.py:32-41)."""
    return jax.random.uniform(key, (3,)) * magnitude
