"""approx_knn variant: registration quality matches exact top-k."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.ops.se3 import decompose_trans, relative_rotation_error
from tests.test_model import make_synthetic_pair


@pytest.mark.slow
def test_approx_knn_registration_quality(rng):
    exact = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=20, ratio=0.2)
    approx = exact.clone(approx_knn=True)
    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=256, inlier_ratio=0.6)
    batch = lambda a: jnp.asarray(a)[None]
    variables = exact.init(jax.random.key(1), batch(cp), batch(src), batch(tgt))

    for model in (exact, approx):
        out = model.apply(variables, batch(cp), batch(src), batch(tgt), testing=True)
        R_pred, t_pred = decompose_trans(out.final_trans)
        re = float(relative_rotation_error(R_pred[0], jnp.asarray(gt[:3, :3])))
        te = float(jnp.linalg.norm(t_pred[0, :, 0] - jnp.asarray(gt[:3, 3])))
        assert re < 2.0 and te < 0.05, (model.approx_knn, re, te)


def test_approx_max_k_recall1_is_exact(rng):
    """The model's exact-knn path uses approx_max_k(recall_target=1.0),
    which must return the same index SET as lax.top_k (it lowers to the
    faster PartialReduce op on TPU)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.normal(size=(64, 512)).astype(np.float32))
    _, i1 = jax.lax.top_k(x, 17)
    _, i2 = jax.lax.approx_max_k(x, 17, recall_target=1.0)
    i1, i2 = np.asarray(i1), np.asarray(i2)
    for r in range(64):
        assert set(i1[r]) == set(i2[r])
