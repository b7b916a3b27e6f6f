"""PointDSC model: shape, masking, and synthetic-registration recovery tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointdsc_tpu.models import PointDSC, MaskedBatchNorm, NonLocalNet
from pointdsc_tpu.ops.se3 import decompose_trans, relative_rotation_error


def make_synthetic_pair(rng, n=256, inlier_ratio=0.6, noise=0.005):
    """Random rigid pair with planted inliers/outliers, reference-style."""
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 0.5
    src = rng.uniform(-1, 1, size=(n, 3))
    tgt = src @ Q.T + t + rng.normal(size=(n, 3)) * noise
    n_out = int(n * (1 - inlier_ratio))
    out_idx = rng.choice(n, n_out, replace=False)
    tgt[out_idx] = rng.uniform(-1, 1, size=(n_out, 3))
    labels = np.ones(n, dtype=np.float32)
    labels[out_idx] = 0.0
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3], gt[:3, 3] = Q, t
    corr_pos = np.concatenate([src, tgt], axis=-1)
    corr_pos = corr_pos - corr_pos.mean(0)
    return (
        corr_pos.astype(np.float32),
        src.astype(np.float32),
        tgt.astype(np.float32),
        gt,
        labels,
    )


@pytest.fixture(scope="module")
def small_model():
    return PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)


@pytest.fixture(scope="module")
def small_vars(small_model):
    rng = np.random.default_rng(0)
    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=64)
    variables = small_model.init(
        jax.random.key(0),
        jnp.asarray(cp)[None],
        jnp.asarray(src)[None],
        jnp.asarray(tgt)[None],
    )
    return variables


class TestMaskedBatchNorm:
    def test_masked_stats_ignore_padding(self, rng):
        x = rng.normal(size=(2, 10, 4)).astype(np.float32)
        x[:, 7:] = 100.0  # garbage in padding
        mask = np.zeros((2, 10), dtype=bool)
        mask[:, :7] = True
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.key(0), jnp.asarray(x), mask=jnp.asarray(mask), train=True)
        y, updates = bn.apply(
            vars_, jnp.asarray(x), mask=jnp.asarray(mask), train=True,
            mutable=["batch_stats"],
        )
        valid = np.asarray(y)[:, :7].reshape(-1, 4)
        np.testing.assert_allclose(valid.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(valid.std(0), 1.0, atol=1e-3)

    def test_running_stats_used_in_eval(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.key(0), x, train=True)
        # feed batches to accumulate stats
        for _ in range(5):
            _, updates = bn.apply(vars_, x, train=True, mutable=["batch_stats"])
            vars_ = {**vars_, "batch_stats": updates["batch_stats"]}
        y_eval = bn.apply(vars_, x, train=False)
        assert np.isfinite(np.asarray(y_eval)).all()


class TestForwardShapes:
    def test_train_mode_outputs(self, small_model, small_vars, rng):
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=64)
        batch = lambda a: jnp.asarray(a)[None]
        out, _ = small_model.apply(
            small_vars, batch(cp), batch(src), batch(tgt),
            train=True, mutable=["batch_stats"],
        )
        assert out.final_trans.shape == (1, 4, 4)
        assert out.final_labels.shape == (1, 64)
        assert out.M.shape == (1, 64, 64)
        assert out.seed_trans.shape == (1, int(64 * 0.2), 4, 4)
        assert np.isfinite(np.asarray(out.final_trans)).all()

    def test_test_mode_outputs(self, small_model, small_vars, rng):
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=64)
        batch = lambda a: jnp.asarray(a)[None]
        out = small_model.apply(
            small_vars, batch(cp), batch(src), batch(tgt), testing=True,
        )
        assert out.M is None
        # labels are hard 0/1 at test time
        vals = set(np.unique(np.asarray(out.final_labels)).tolist())
        assert vals.issubset({0.0, 1.0})

    @pytest.mark.slow
    def test_mask_invariance(self, small_model, small_vars, rng):
        """Padding with masked garbage must not change the result."""
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=64)
        batch = lambda a: jnp.asarray(a)[None]
        out_ref = small_model.apply(
            small_vars, batch(cp), batch(src), batch(tgt), testing=True,
        )
        pad = 32
        padf = lambda a: jnp.asarray(
            np.concatenate([a, np.full((pad,) + a.shape[1:], 7.7, a.dtype)], 0)
        )[None]
        mask = jnp.asarray(np.arange(64 + pad) < 64)[None]
        out_pad = small_model.apply(
            small_vars, padf(cp), padf(src), padf(tgt), mask=mask, testing=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_pad.final_trans), np.asarray(out_ref.final_trans),
            atol=1e-4,
        )


class TestRegistrationRecovery:
    def test_untrained_model_recovers_easy_pair(self, rng):
        """With 70% inliers the geometric pipeline (NSM + Procrustes +
        hypothesis selection + refinement) must recover the transform even
        with random encoder weights -- the spatial-consistency machinery, not
        the learned features, does the heavy lifting."""
        model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=20, ratio=0.2)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=256, inlier_ratio=0.7)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(1), batch(cp), batch(src), batch(tgt))
        out = model.apply(variables, batch(cp), batch(src), batch(tgt), testing=True)
        R_pred, t_pred = decompose_trans(out.final_trans)
        re = float(relative_rotation_error(R_pred[0], jnp.asarray(gt[:3, :3])))
        te = float(jnp.linalg.norm(t_pred[0, :, 0] - jnp.asarray(gt[:3, 3])))
        assert re < 2.0, f"rotation error {re} deg"
        assert te < 0.05, f"translation error {te} m"
        # predicted labels should roughly match gt inliers
        acc = (np.asarray(out.final_labels)[0] == lab).mean()
        assert acc > 0.9

    def test_jit_forward(self, rng):
        model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=128)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))

        @jax.jit
        def fwd(v, cp, s, t):
            return model.apply(v, cp, s, t, testing=True).final_trans

        trans = fwd(variables, batch(cp), batch(src), batch(tgt))
        assert np.isfinite(np.asarray(trans)).all()

    @pytest.mark.slow
    def test_grad_through_training_forward(self, rng):
        model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=64)
        batch = lambda a: jnp.asarray(a)[None]
        variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
        params, batch_stats = variables["params"], variables["batch_stats"]

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch(cp), batch(src), batch(tgt),
                train=True, mutable=["batch_stats"],
            )
            # simple BCE on confidence + M mse
            lab_j = jnp.asarray(lab)[None]
            bce = jnp.mean(
                jnp.maximum(out.confidence, 0)
                - out.confidence * lab_j
                + jnp.log1p(jnp.exp(-jnp.abs(out.confidence)))
            )
            return bce + jnp.mean(out.M**2)

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)
