"""VoxelFCGF contrastive training: loss semantics + learning smoke test."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import optax

from pointdsc_tpu.descriptors.fcgf import VoxelFCGF, voxelize
from pointdsc_tpu.descriptors.fcgf_train import (
    hardest_contrastive_loss,
    make_fcgf_train_step,
)


class TestLoss:
    def test_perfect_descriptors_low_loss(self, rng):
        # matched pairs identical, all far apart from each other
        f = np.eye(16, dtype=np.float32) * 2.0  # mutual distances ~2.8 > margin
        loss, metrics = hardest_contrastive_loss(jnp.asarray(f), jnp.asarray(f))
        assert float(metrics["pos_loss"]) < 1e-10
        assert float(loss) < 1e-6

    def test_collapsed_descriptors_high_loss(self, rng):
        f = np.ones((16, 8), np.float32)
        loss, metrics = hardest_contrastive_loss(jnp.asarray(f), jnp.asarray(f))
        assert float(metrics["neg_loss"]) > 0.5  # collapse punished


class TestTrainStep:
    def test_loss_decreases(self, rng):
        model = VoxelFCGF(out_dim=8, enc_channels=(4, 8, 8, 8),
                          dec_channels=(8, 8, 4, 4))
        pts = rng.uniform(0, 1.5, (300, 3))
        occ, idx, _ = voxelize(pts, 0.05, 32)
        occ0 = jnp.asarray(occ)[None]
        # second "view": same occupancy (identity augmentation) -- the loss
        # still has to separate different voxels while matching identical ones
        uniq = np.unique(idx, axis=0)[:64]
        idx_j = jnp.asarray(uniq)

        variables = model.init(jax.random.key(0), occ0)
        tx = optax.adam(1e-3)
        opt_state = tx.init(variables["params"])
        step = make_fcgf_train_step(model, tx)

        params, stats = variables["params"], variables["batch_stats"]
        mask = jnp.ones((64,), bool)
        losses = []
        for _ in range(8):
            params, opt_state, stats, metrics = step(
                params, opt_state, stats, occ0, occ0, idx_j, idx_j, mask
            )
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
