"""Full-model equivalence: fused Pallas attention path vs dense path."""

import numpy as np
import jax
import jax.numpy as jnp

from pointdsc_tpu.models import PointDSC
from tests.test_model import make_synthetic_pair


class TestFusedForward:
    def test_fused_matches_dense(self, rng):
        model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=16, ratio=0.1)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=256, inlier_ratio=0.6)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))

        out_dense = model.apply(
            variables, batch(cp), batch(src), batch(tgt), testing=True
        )
        out_fused = model.apply(
            variables, batch(cp), batch(src), batch(tgt),
            testing=True, fused_attention=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_fused.final_trans),
            np.asarray(out_dense.final_trans),
            atol=1e-3,
        )
        # label agreement
        agree = (
            np.asarray(out_fused.final_labels) == np.asarray(out_dense.final_labels)
        ).mean()
        assert agree > 0.99

    def test_fused_masked(self, rng):
        model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=16, ratio=0.1)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=200, inlier_ratio=0.6)
        pad = 56  # to 256
        batchp = lambda a: jnp.asarray(
            np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        )[None]
        mask = jnp.asarray(np.arange(256) < 200)[None]
        variables = model.init(
            jax.random.key(0), batchp(cp), batchp(src), batchp(tgt), mask=mask
        )
        out_dense = model.apply(
            variables, batchp(cp), batchp(src), batchp(tgt), mask=mask, testing=True
        )
        out_fused = model.apply(
            variables, batchp(cp), batchp(src), batchp(tgt), mask=mask,
            testing=True, fused_attention=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_fused.final_trans),
            np.asarray(out_dense.final_trans),
            atol=1e-3,
        )
