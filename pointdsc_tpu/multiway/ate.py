"""Absolute trajectory error (ATE) for multiway registration.

Mirrors /root/reference/multiway/test_multi_ate.py:31-51,268-290: align the
estimated camera-center trajectory to ground truth with an (unweighted)
Procrustes fit, then report the RMSE of aligned positions in centimeters.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pointdsc_tpu.ops.procrustes import weighted_procrustes
from pointdsc_tpu.ops.se3 import transform


def trajectory_positions(poses: list[np.ndarray]) -> np.ndarray:
    """Fragment poses (node -> world) -> camera centers [n, 3]."""
    return np.stack([np.asarray(p)[:3, 3] for p in poses], axis=0)


def align_trajectories(est: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Rigidly align est positions [n, 3] to gt; returns aligned est."""
    trans = weighted_procrustes(jnp.asarray(est)[None], jnp.asarray(gt)[None])
    return np.asarray(transform(jnp.asarray(est)[None], trans))[0]


def ate_rmse(est_poses: list[np.ndarray], gt_poses: list[np.ndarray]) -> float:
    """ATE RMSE in centimeters after rigid alignment."""
    est = trajectory_positions(est_poses)
    gt = trajectory_positions(gt_poses)
    aligned = align_trajectories(est, gt)
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=-1))) * 100.0)
