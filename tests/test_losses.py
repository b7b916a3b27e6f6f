"""Loss functions vs hand-computed / reference-semantics values."""

import numpy as np
import jax.numpy as jnp

from pointdsc_tpu.train.losses import (
    classification_loss,
    classification_metrics,
    spectral_matching_loss,
    transformation_loss,
)


def bce_np(logits, labels, pos_weight=1.0):
    s = 1 / (1 + np.exp(-logits))
    return -(pos_weight * labels * np.log(s) + (1 - labels) * np.log(1 - s))


class TestClassificationLoss:
    def test_matches_numpy_bce(self, rng):
        logits = rng.normal(size=(2, 20)).astype(np.float64)
        labels = (rng.random((2, 20)) > 0.5).astype(np.float64)
        loss = float(classification_loss(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(loss, bce_np(logits, labels).mean(), rtol=1e-6)

    def test_balanced_pos_weight(self, rng):
        logits = rng.normal(size=(1, 100))
        labels = np.zeros((1, 100))
        labels[0, :10] = 1  # 10 pos, 90 neg -> pos_weight = 90/10
        loss = float(
            classification_loss(jnp.asarray(logits), jnp.asarray(labels), balanced=True)
        )
        expect = bce_np(logits, labels, pos_weight=90.0 / 10.0).mean()
        np.testing.assert_allclose(loss, expect, rtol=1e-6)

    def test_mask_excludes_padding(self, rng):
        logits = rng.normal(size=(1, 30))
        labels = (rng.random((1, 30)) > 0.5).astype(np.float64)
        mask = np.arange(30) < 20
        loss = float(
            classification_loss(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask[None])
            )
        )
        expect = bce_np(logits[:, :20], labels[:, :20]).mean()
        np.testing.assert_allclose(loss, expect, rtol=1e-6)

    def test_metrics(self):
        logits = jnp.asarray([[2.0, -2.0, 2.0, -2.0]])
        labels = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        m = classification_metrics(logits, labels)
        assert float(m["precision"]) == 0.5  # tp=1, fp=1
        assert float(m["recall"]) == 0.5  # tp=1, fn=1


class TestSpectralMatchingLoss:
    def test_perfect_M_zero_loss(self):
        labels = jnp.asarray([[1.0, 1.0, 0.0]])
        gt_M = np.zeros((1, 3, 3))
        gt_M[0, 0, 1] = gt_M[0, 1, 0] = 1.0
        loss = float(spectral_matching_loss(jnp.asarray(gt_M), labels, balanced=True))
        assert loss < 1e-10

    def test_balanced_semantics(self, rng):
        """Replicate the reference formula exactly (loss.py:133-136)."""
        n = 12
        M = rng.random((2, n, n))
        labels = (rng.random((2, n)) > 0.5).astype(np.float64)
        gt_M = ((labels[:, None, :] + labels[:, :, None]) == 2).astype(np.float64)
        for i in range(2):
            np.fill_diagonal(gt_M[i], 0)
        Mz = M * (1 - np.eye(n))  # our M always has zero diag
        p = ((Mz - 1) ** 2 * gt_M).sum((-1, -2)) / (
            np.maximum(gt_M.sum((-1, -2)) - 1, 0) + 1
        )
        # reference loss.py:135: the negative set INCLUDES the diagonal
        # entries (gt_M diag is 0, M diag is 0, so they only pad the
        # denominator)
        nn_ = (Mz**2 * (1 - gt_M)).sum((-1, -2)) / (
            np.maximum((1 - gt_M).sum((-1, -2)) - 1, 0) + 1
        )
        expect = np.mean(0.5 * p + 0.5 * nn_)
        got = float(
            spectral_matching_loss(jnp.asarray(Mz), jnp.asarray(labels), balanced=True)
        )
        np.testing.assert_allclose(got, expect, rtol=1e-5)


class TestTransformationLoss:
    def test_perfect_transform(self, rng):
        src = rng.normal(size=(2, 30, 3))
        R = np.eye(3)
        gt = np.broadcast_to(np.eye(4), (2, 4, 4)).copy()
        out = transformation_loss(
            jnp.asarray(gt), jnp.asarray(gt),
            jnp.asarray(src), jnp.asarray(src),
            probs=jnp.ones((2, 30)),
        )
        assert float(out.loss) < 1e-10
        assert float(out.recall) == 100.0
        assert float(out.re) < 1e-3
        assert float(out.te) < 1e-6

    def test_failed_transform_not_recalled(self, rng):
        src = rng.normal(size=(1, 30, 3))
        gt = np.eye(4)[None]
        bad = np.eye(4)[None].copy()
        bad[0, :3, :3] = np.array(
            [[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]
        )  # 90 deg off
        out = transformation_loss(
            jnp.asarray(bad), jnp.asarray(gt),
            jnp.asarray(src), jnp.asarray(src),
            probs=jnp.ones((1, 30)),
        )
        assert float(out.recall) == 0.0
        assert abs(float(out.re) - 90.0) < 1e-3

    def test_no_inliers_zero_loss(self, rng):
        src = rng.normal(size=(1, 10, 3))
        gt = np.eye(4)[None]
        out = transformation_loss(
            jnp.asarray(gt), jnp.asarray(gt),
            jnp.asarray(src), jnp.asarray(src + 1.0),
            probs=jnp.full((1, 10), -1.0),  # no predicted inliers
        )
        assert float(out.loss) == 0.0
