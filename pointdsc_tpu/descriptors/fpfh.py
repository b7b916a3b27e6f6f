"""FPFH descriptor backend, TPU-native.

Replaces the reference's Open3D C++ FPFH extraction
(/root/reference/misc/cal_fpfh.py:7-106, demo_registration.py:37-44):
voxel downsample -> normals -> 33-bin FPFH histograms. The demo and the
multiway pipeline consume these features exactly like the Open3D ones (they
are L2-normalized at load either way, ThreeDMatch.py:82-83).

TPU design decisions:
  * neighborhoods are fixed-k (radius-masked) instead of variable-radius
    lists: every stage is a static-shape gather + masked reduction;
  * neighbor search is a chunked matmul-form distance + top_k (lax.map over
    query blocks), so nothing O(N^2) is ever resident;
  * normals come from the batched closed-form 3x3 Jacobi eigensolver
    (ops/linalg.py), smallest eigenvector of the neighborhood covariance;
  * the 3 x 11 angle histograms are one-hot scatters -> segment sums, all
    vectorized; SPFH -> FPFH aggregation is a masked weighted gather-sum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pointdsc_tpu.ops.linalg import symeig3x3

_BIG = 1e9


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Average points per occupied voxel (host-side numpy, like the
    reference's open3d.voxel_down_sample)."""
    keys = np.floor(points / voxel_size).astype(np.int64)
    # lexicographic voxel id
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((counts.shape[0], 3), dtype=np.float64)
    np.add.at(sums, inv, points)
    return (sums / counts[:, None]).astype(np.float32)


def _chunked_radius_knn(points: jnp.ndarray, k: int, radius: float, chunk: int = 2048):
    """For each point: indices + validity of up to k neighbors within radius
    (self excluded). Returns (idx [N, k], valid [N, k])."""
    n = points.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    pts_pad = jnp.concatenate(
        [points, jnp.full((pad, 3), _BIG, points.dtype)], axis=0
    )
    sq_all = jnp.sum(points * points, axis=-1)

    def block(start):
        q = jax.lax.dynamic_slice(pts_pad, (start, 0), (chunk, 3))
        sq_q = jnp.sum(q * q, axis=-1)
        d2 = sq_q[:, None] + sq_all[None, :] - 2.0 * (q @ points.T)
        d2 = jnp.maximum(d2, 0.0)
        # exclude self (distance 0 at own index)
        rows = jnp.arange(chunk) + start
        cols = jnp.arange(n)
        d2 = jnp.where(rows[:, None] == cols[None, :], _BIG, d2)
        neg, idx = jax.lax.top_k(-d2, k)
        valid = -neg < radius * radius
        return idx, valid

    starts = jnp.arange(0, n_pad, chunk)
    idxs, valids = jax.lax.map(block, starts)
    idx = idxs.reshape(n_pad, k)[:n]
    valid = valids.reshape(n_pad, k)[:n]
    return idx, valid


@partial(jax.jit, static_argnames=("max_nn",))
def estimate_normals(
    points: jnp.ndarray, radius: float, max_nn: int = 30
) -> jnp.ndarray:
    """Normals as the smallest eigenvector of the radius-masked k-NN
    covariance, oriented towards the origin (camera viewpoint convention of
    depth-sensor fragments)."""
    idx, valid = _chunked_radius_knn(points, max_nn, radius)
    neigh = points[idx]  # [N, k, 3]
    w = valid.astype(points.dtype)[..., None]
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(neigh * w, axis=1) / count
    centered = (neigh - mean[:, None]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / count[..., None]
    _, V = symeig3x3(cov)
    normal = V[..., :, 0]  # smallest eigenvalue -> surface normal
    # orient towards the origin
    flip = jnp.sum(normal * points, axis=-1) > 0
    return jnp.where(flip[:, None], -normal, normal)


def _angle_histograms(alpha, phi, theta, wmask, bins: int = 11):
    """Per-point 3 x `bins` histograms of the Darboux angles, masked and
    normalized to percentages (Open3D convention)."""

    def hist(x, lo, hi):
        t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0 - 1e-7)
        b = jnp.floor(t * bins).astype(jnp.int32)  # [N, k]
        onehot = jax.nn.one_hot(b, bins, dtype=x.dtype) * wmask[..., None]
        return jnp.sum(onehot, axis=1)  # [N, bins]

    h_alpha = hist(alpha, -1.0, 1.0)
    h_phi = hist(phi, -1.0, 1.0)
    h_theta = hist(theta, -jnp.pi, jnp.pi)
    h = jnp.concatenate([h_alpha, h_phi, h_theta], axis=-1)  # [N, 33]
    count = jnp.maximum(jnp.sum(wmask, axis=1, keepdims=True), 1.0)
    return h * (100.0 / count)


@partial(jax.jit, static_argnames=("max_nn",))
def fpfh_features(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    radius: float,
    max_nn: int = 100,
) -> jnp.ndarray:
    """33-dim FPFH (Rusu et al. 2009): SPFH histograms of the Darboux-frame
    angles, then neighbor aggregation FPFH(p) = SPFH(p) +
    (1/k) sum_q SPFH(q)/dist(p,q)."""
    idx, valid = _chunked_radius_knn(points, max_nn, radius)
    n, k = idx.shape
    p = points[:, None]  # [N, 1, 3]
    q = points[idx]  # [N, k, 3]
    nq = normals[idx]
    d = q - p
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    du = d / dist[..., None]

    # Darboux frame at p: u = n_p, v = u x du, w = u x v
    u = jnp.broadcast_to(normals[:, None], d.shape)
    v = jnp.cross(du, u)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * nq, axis=-1)
    phi = jnp.sum(du * u, axis=-1)
    theta = jnp.arctan2(jnp.sum(w * nq, axis=-1), jnp.sum(u * nq, axis=-1))

    wmask = valid.astype(points.dtype)
    spfh = _angle_histograms(alpha, phi, theta, wmask)  # [N, 33]

    # FPFH aggregation with 1/distance weights over the same neighborhoods
    inv_d = jnp.where(valid, 1.0 / jnp.maximum(dist, 1e-6), 0.0)
    neigh_spfh = spfh[idx]  # [N, k, 33]
    k_eff = jnp.maximum(jnp.sum(wmask, axis=1, keepdims=True), 1.0)
    agg = jnp.sum(neigh_spfh * inv_d[..., None], axis=1) / k_eff
    return spfh + agg


def extract_fpfh(
    points: np.ndarray,
    voxel_size: float = 0.03,
    normal_radius: float | None = None,
    feature_radius: float | None = None,
):
    """Full pipeline on a raw cloud; returns (keypts [M, 3], features [M, 33]).

    Radii default to the reference's 2x / 5x voxel size
    (misc/cal_fpfh.py, demo_registration.py:37-44).
    """
    normal_radius = normal_radius or voxel_size * 2.0
    feature_radius = feature_radius or voxel_size * 5.0
    down = voxel_downsample(np.asarray(points, np.float64), voxel_size)
    pts = jnp.asarray(down, jnp.float32)
    normals = estimate_normals(pts, normal_radius, max_nn=30)
    feats = fpfh_features(pts, normals, feature_radius, max_nn=100)
    return down, np.asarray(feats)
