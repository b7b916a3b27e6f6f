"""OANet alternative model: shapes, gradients, learning signal."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointdsc_tpu.models import OANet
from tests.test_model import make_synthetic_pair


class TestOANet:
    def test_forward_shapes(self, rng):
        model = OANet(in_dim=6, num_layers=6, num_channels=32, num_clusters=8)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=128)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
        out, _ = model.apply(
            variables, batch(cp), batch(src), batch(tgt),
            train=True, mutable=["batch_stats"],
        )
        assert out["final_trans"].shape == (1, 4, 4)
        assert out["final_labels"].shape == (1, 128)
        assert np.isfinite(np.asarray(out["final_trans"])).all()

    @pytest.mark.slow
    def test_grads_finite(self, rng):
        model = OANet(in_dim=6, num_layers=4, num_channels=16, num_clusters=4)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=64)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
        lab_j = jnp.asarray(lab)[None]

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch(cp), batch(src), batch(tgt),
                train=True, mutable=["batch_stats"],
            )
            logits = out["final_labels"]
            return jnp.mean(
                jnp.maximum(logits, 0) - logits * lab_j
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)

    def test_mask_respected(self, rng):
        model = OANet(in_dim=6, num_layers=4, num_channels=16, num_clusters=4)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=96)
        pad = 32
        batchp = lambda a: jnp.asarray(
            np.concatenate([a, np.full((pad,) + a.shape[1:], 5.0, a.dtype)], 0)
        )[None]
        mask = jnp.asarray(np.arange(128) < 96)[None]
        variables = model.init(
            jax.random.key(0), batchp(cp), batchp(src), batchp(tgt), mask=mask
        )
        out = model.apply(
            variables, batchp(cp), batchp(src), batchp(tgt), mask=mask, testing=True
        )
        # padded logits forced to -inf-ish
        assert np.asarray(out["final_labels"])[0, 96:].max() <= -1e8
