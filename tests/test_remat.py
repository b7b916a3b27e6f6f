"""remat option: gradients identical to the non-remat path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.train.losses import classification_loss
from tests.test_model import make_synthetic_pair


def test_remat_grads_match(rng):
    base = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)
    rem = base.clone(remat=True)
    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=128)
    batch = lambda a: jnp.asarray(a)[None]
    variables = base.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
    lab_j = jnp.asarray(lab)[None]

    def loss_fn(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch(cp), batch(src), batch(tgt),
            train=True, mutable=["batch_stats"],
        )
        return classification_loss(out.final_labels, lab_j)

    g0 = jax.grad(lambda p: loss_fn(p, base))(variables["params"])
    g1 = jax.grad(lambda p: loss_fn(p, rem))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_composes_with_fused_attention(rng):
    """remat + fused custom-VJP attention: gradients match the dense path
    (large-N training memory plan: VJP kernel recomputes its tiles inside
    the rematerialized layer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointdsc_tpu.models import PointDSC
    from pointdsc_tpu.train.losses import classification_loss, spectral_matching_loss
    from tests.test_model import make_synthetic_pair

    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=128, inlier_ratio=0.6)
    batch = lambda a: jnp.asarray(a)[None]
    base = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)
    variables = base.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
    lab_j = jnp.asarray(lab)[None]

    def loss_fn(params, model, fused):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch(cp), batch(src), batch(tgt),
            train=True, fused_attention=fused, mutable=["batch_stats"],
        )
        return classification_loss(out.final_labels, lab_j) + \
            spectral_matching_loss(out.M, lab_j)

    g_dense = jax.grad(loss_fn)(variables["params"], base, False)
    g_rf = jax.grad(loss_fn)(variables["params"], base.clone(remat=True), True)
    for a, b in zip(jax.tree_util.tree_leaves(g_rf),
                    jax.tree_util.tree_leaves(g_dense)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
