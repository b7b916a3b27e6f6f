"""Tiled FCGF extraction for outdoor-scale clouds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pointdsc_tpu.descriptors.fcgf import (
    VoxelFCGF,
    extract_features,
    extract_features_tiled,
)


def test_tiled_covers_cloud(rng):
    model = VoxelFCGF(out_dim=8, enc_channels=(4, 8, 8, 8),
                      dec_channels=(8, 8, 4, 4))
    occ = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(jax.random.key(0), occ)

    # cloud spanning several tiles at 0.3 voxel, 32-grid, halo 4
    pts = rng.uniform(0, 25.0, (3000, 3))
    keypts, feats = extract_features_tiled(
        model, variables, pts, voxel_size=0.3, grid_size=32, halo=4
    )
    assert len(keypts) > 500
    assert feats.shape == (len(keypts), 8)
    assert np.isfinite(feats).all()
    # coverage: keypoints span the cloud extent
    assert keypts.min() > -1.0 and keypts.max() < 26.0
    for axis in range(3):
        assert keypts[:, axis].max() - keypts[:, axis].min() > 15.0


def test_tiled_matches_single_when_cloud_fits(rng):
    model = VoxelFCGF(out_dim=8, enc_channels=(4, 8, 8, 8),
                      dec_channels=(8, 8, 4, 4))
    occ = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(jax.random.key(0), occ)
    pts = rng.uniform(0, 0.9, (400, 3))  # fits one 32^3 x 0.05 grid
    k1, f1 = extract_features(model, variables, pts, 0.05, 32)
    k2, f2 = extract_features_tiled(model, variables, pts, 0.05, 32, halo=4)
    # the tile lattice shifts the voxel grid, so compare coverage rather
    # than exact voxel identity: similar counts, every tiled keypoint close
    # to a single-grid keypoint
    assert 0.7 * len(k1) < len(k2) < 1.5 * len(k1)
    d = np.linalg.norm(k2[:, None] - k1[None], axis=-1).min(axis=1)
    assert (d < 0.05 * np.sqrt(3) + 1e-6).all()
