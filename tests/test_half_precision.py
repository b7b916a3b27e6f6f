"""bf16 encoder variant: numerical sanity + registration recovery."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.ops.se3 import decompose_trans, relative_rotation_error
from tests.test_model import make_synthetic_pair


class TestHalfPrecision:
    def test_bf16_recovers_registration(self, rng):
        model = PointDSC(
            in_dim=6, num_layers=2, num_channels=32, k=20, ratio=0.2,
            half_precision=True,
        )
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=256, inlier_ratio=0.7)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(1), batch(cp), batch(src), batch(tgt))
        out = model.apply(variables, batch(cp), batch(src), batch(tgt), testing=True)
        R_pred, t_pred = decompose_trans(out.final_trans)
        re = float(relative_rotation_error(R_pred[0], jnp.asarray(gt[:3, :3])))
        te = float(jnp.linalg.norm(t_pred[0, :, 0] - jnp.asarray(gt[:3, 3])))
        assert re < 2.0 and te < 0.05, (re, te)

    def test_params_stay_f32(self, rng):
        model = PointDSC(
            in_dim=6, num_layers=2, num_channels=32, k=12, half_precision=True
        )
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=64)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
