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


def test_fused_sm_loss_grads_match_dense(rng):
    """Whole-model gradients with skip_M + the fused SM-loss kernel equal
    the dense M chain's (config.fused_sm_loss wiring)."""
    from pointdsc_tpu.kernels.sm_loss import fused_spectral_matching_loss

    model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)
    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=128, inlier_ratio=0.6)
    batch = lambda a: jnp.asarray(a)[None]
    variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
    lab_j = jnp.asarray(lab)[None]

    def loss_dense(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch(cp), batch(src), batch(tgt),
            train=True, mutable=["batch_stats"],
        )
        return spectral_matching_loss(out.M, lab_j, balanced=True)

    def loss_fused(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch(cp), batch(src), batch(tgt),
            train=True, skip_M=True, mutable=["batch_stats"],
        )
        assert out.M is None
        return fused_spectral_matching_loss(
            out.normed_features, out.sigma, lab_j,
            jnp.ones_like(lab_j, dtype=bool), True,
        )

    ld, g_dense = jax.value_and_grad(loss_dense)(variables["params"])
    lf, g_fused = jax.value_and_grad(loss_fused)(variables["params"])
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    flat_d = jax.tree_util.tree_leaves(g_dense)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_f, flat_d):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
