"""Property tests: pipeline robustness across inlier regimes + aux metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pointdsc_tpu.eval.metrics import exact_auc, rot_to_euler
from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.ops.se3 import decompose_trans, relative_rotation_error
from pointdsc_tpu.data import transforms_np as T
from tests.test_model import make_synthetic_pair


class TestInlierRegimes:
    @pytest.mark.parametrize("ratio", [0.2, 0.4, 0.8])
    def test_recovery_across_ratios(self, rng, ratio):
        model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=24, ratio=0.2)
        cp, src, tgt, gt, lab = make_synthetic_pair(
            rng, n=384, inlier_ratio=ratio, noise=0.005
        )
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(2), batch(cp), batch(src), batch(tgt))
        out = model.apply(variables, batch(cp), batch(src), batch(tgt), testing=True)
        R_pred, t_pred = decompose_trans(out.final_trans)
        re = float(relative_rotation_error(R_pred[0], jnp.asarray(gt[:3, :3])))
        te = float(jnp.linalg.norm(t_pred[0, :, 0] - jnp.asarray(gt[:3, 3])))
        assert re < 3.0 and te < 0.08, (ratio, re, te)


class TestAuxMetrics:
    def test_exact_auc_extremes(self):
        # all-zero errors -> AUC 1; all errors beyond threshold -> AUC 0
        assert exact_auc(np.zeros(10), [5.0]) == [1.0]
        np.testing.assert_allclose(exact_auc(np.full(10, 100.0), [5.0]), [0.0])

    def test_exact_auc_midpoint(self):
        # half the pairs at error ~0, half far beyond: AUC ~ 0.5
        errors = np.concatenate([np.full(50, 1e-9), np.full(50, 1e9)])
        (auc,) = exact_auc(errors, [10.0])
        assert abs(auc - 0.5) < 0.01

    def test_rot_to_euler_roundtrip(self, rng):
        for _ in range(5):
            angles = rng.uniform(-60, 60, 3)  # degrees, away from gimbal lock
            rx, ry, rz = np.radians(angles)
            Rx = np.array([[1, 0, 0], [0, np.cos(rx), -np.sin(rx)],
                           [0, np.sin(rx), np.cos(rx)]])
            Ry = np.array([[np.cos(ry), 0, np.sin(ry)], [0, 1, 0],
                           [-np.sin(ry), 0, np.cos(ry)]])
            Rz = np.array([[np.cos(rz), -np.sin(rz), 0],
                           [np.sin(rz), np.cos(rz), 0], [0, 0, 1]])
            R = Rz @ Ry @ Rx
            np.testing.assert_allclose(rot_to_euler(R), angles, atol=1e-6)
