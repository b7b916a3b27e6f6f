"""Training with fused attention: gradients match the dense path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.train.losses import classification_loss, spectral_matching_loss
from tests.test_model import make_synthetic_pair


def test_fused_training_grads_match_dense(rng):
    model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)
    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=128, inlier_ratio=0.6)
    batch = lambda a: jnp.asarray(a)[None]
    variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
    lab_j = jnp.asarray(lab)[None]

    def loss_fn(params, fused):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch(cp), batch(src), batch(tgt),
            train=True, fused_attention=fused, mutable=["batch_stats"],
        )
        return classification_loss(out.final_labels, lab_j) + \
            spectral_matching_loss(out.M, lab_j)

    g_dense = jax.grad(loss_fn)(variables["params"], False)
    g_fused = jax.grad(loss_fn)(variables["params"], True)
    flat_d = jax.tree_util.tree_leaves(g_dense)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_f, flat_d):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
