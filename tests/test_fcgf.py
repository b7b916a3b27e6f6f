"""VoxelFCGF descriptor net: shapes, normalization, extraction API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pointdsc_tpu.descriptors.fcgf import VoxelFCGF, extract_features, voxelize


@pytest.fixture(scope="module")
def tiny_net():
    model = VoxelFCGF(out_dim=16, enc_channels=(8, 16, 32, 32),
                      dec_channels=(16, 16, 8, 8))
    occ = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(jax.random.key(0), occ)
    return model, variables


class TestVoxelize:
    def test_occupancy(self, rng):
        pts = rng.uniform(0, 1.0, (100, 3))
        occ, idx, origin = voxelize(pts, 0.05, 32)
        assert occ.shape == (32, 32, 32, 1)
        assert occ.sum() <= 100
        assert (idx >= 0).all() and (idx < 32).all()


class TestVoxelFCGF:
    def test_forward_shape_and_norm(self, tiny_net, rng):
        model, variables = tiny_net
        pts = rng.uniform(0, 1.5, (500, 3))
        occ, _, _ = voxelize(pts, 0.05, 32)
        out = model.apply(variables, jnp.asarray(occ)[None], train=False)
        assert out.shape == (1, 32, 32, 32, 16)
        # voxels are unit-normalized except exactly-zero feature vectors
        # (dead regions), which safe-normalize to zero
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        assert norms.max() <= 1.0 + 1e-3
        assert (norms > 0.99).mean() > 0.5

    def test_extract_features(self, tiny_net, rng):
        model, variables = tiny_net
        pts = rng.uniform(0, 1.5, (500, 3))
        keypts, feats = extract_features(model, variables, pts, 0.05, 32)
        assert keypts.shape[0] == feats.shape[0]
        assert feats.shape[1] == 16
        assert np.isfinite(feats).all()
        # keypoints live near the original cloud
        assert keypts.min() >= pts.min() - 0.05
        assert keypts.max() <= pts.max() + 0.05

    def test_train_mode_updates_stats(self, tiny_net, rng):
        model, variables = tiny_net
        occ = jnp.asarray(rng.random((1, 32, 32, 32, 1)) < 0.05, jnp.float32)
        out, updates = model.apply(
            variables, occ, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in updates
        assert np.isfinite(np.asarray(out)).all()
