"""Fused post-refinement kernel (kernels/refine.py) vs the jnp reference
path (PointDSC.post_refinement), interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointdsc_tpu.kernels.refine import (
    fused_post_refinement,
    pack_refine_strip,
    refine_gram,
)
from pointdsc_tpu.models.pointdsc import PointDSC
from pointdsc_tpu.ops.procrustes import weighted_procrustes


def _random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


class TestRefineGram:
    def test_sufficient_statistics(self, rng):
        n = 384
        src = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        tgt = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        mask = rng.uniform(size=n) > 0.2
        trans = np.eye(4, dtype=np.float32)
        trans[:3, 3] = [0.1, -0.2, 0.05]
        thr = 0.8

        strip = pack_refine_strip(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask)
        )
        G = np.asarray(
            refine_gram(strip, jnp.asarray(trans), thr, interpret=True)
        )

        warped = src @ trans[:3, :3].T + trans[:3, 3]
        d2 = np.sum((warped - tgt) ** 2, axis=-1)
        inl = (d2 < thr * thr) & mask
        w = inl / (1.0 + d2 / thr**2)

        np.testing.assert_allclose(G[4, 3], inl.sum(), rtol=1e-6)
        np.testing.assert_allclose(G[3, 3], w.sum(), rtol=1e-5)
        np.testing.assert_allclose(
            G[:3, :3], np.einsum("n,ni,nj->ij", w, src, tgt), rtol=1e-4
        )
        np.testing.assert_allclose(G[:3, 3], w @ src, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(G[3, :3], w @ tgt, rtol=1e-4, atol=1e-5)


class TestFusedPostRefinement:
    def _setup(self, rng, n=512, scale=1.5, offset=0.0, thr=0.10):
        R = _random_rotation(rng)
        t = rng.normal(size=3).astype(np.float32) * 0.5
        src = (rng.uniform(-scale, scale, (1, n, 3)) + offset).astype(np.float32)
        tgt = src @ R.T + t
        n_out = int(n * 0.55)
        tgt[:, :n_out] += rng.normal(size=(1, n_out, 3)).astype(np.float32)
        mask = np.ones((1, n), bool)
        mask[:, -n // 16 :] = False
        T0 = np.eye(4, dtype=np.float32)
        T0[:3, :3] = R
        T0[:3, 3] = t + thr / 2
        return T0, src, tgt, mask, R, t

    def test_matches_jnp_path(self, rng):
        T0, src, tgt, mask, R, t = self._setup(rng)
        model = PointDSC(refine_iters=20)
        jn = np.asarray(
            model.post_refinement(
                jnp.asarray(T0)[None], jnp.asarray(src), jnp.asarray(tgt),
                jnp.asarray(mask),
            )
        )
        fu = np.asarray(
            fused_post_refinement(
                jnp.asarray(T0)[None], jnp.asarray(src), jnp.asarray(tgt),
                jnp.asarray(mask), 0.10, 20, interpret=True,
            )
        )
        np.testing.assert_allclose(fu, jn, atol=1e-4)
        assert np.abs(fu[0, :3, :3] - R).max() < 1e-4
        assert np.abs(fu[0, :3, 3] - t).max() < 1e-4

    def test_kitti_scale_offset_coordinates(self, rng):
        """Clouds far from the origin: the mean-centering must keep the
        Gram-form covariance accurate in f32."""
        T0, src, tgt, mask, R, t = self._setup(
            rng, n=1024, scale=50.0, offset=150.0, thr=1.2
        )
        model = PointDSC(refine_iters=20, inlier_threshold=0.6)
        jn = np.asarray(
            model.post_refinement(
                jnp.asarray(T0)[None], jnp.asarray(src), jnp.asarray(tgt),
                jnp.asarray(mask),
            )
        )
        fu = np.asarray(
            fused_post_refinement(
                jnp.asarray(T0)[None], jnp.asarray(src), jnp.asarray(tgt),
                jnp.asarray(mask), 1.2, 20, interpret=True,
            )
        )
        # rotation agreement; translation tolerance scales with the 200 m
        # lever arm (1e-6 rotation error -> 2e-4 translation)
        np.testing.assert_allclose(fu[:, :3, :3], jn[:, :3, :3], atol=1e-4)
        np.testing.assert_allclose(fu[:, :3, 3], jn[:, :3, 3], atol=2e-2)

    def test_batched(self, rng):
        T0a, src_a, tgt_a, mask_a, _, _ = self._setup(rng)
        T0b, src_b, tgt_b, mask_b, _, _ = self._setup(rng)
        T0 = np.stack([T0a, T0b])
        src = np.concatenate([src_a, src_b])
        tgt = np.concatenate([tgt_a, tgt_b])
        mask = np.concatenate([mask_a, mask_b])
        fu = fused_post_refinement(
            jnp.asarray(T0), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(mask), 0.10, 20, interpret=True,
        )
        one_a = fused_post_refinement(
            jnp.asarray(T0a)[None], jnp.asarray(src_a), jnp.asarray(tgt_a),
            jnp.asarray(mask_a), 0.10, 20, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(fu)[0], np.asarray(one_a)[0], atol=1e-5)

    def test_heavily_padded_offset_cloud(self, rng):
        """Half the bucket is zero-padding and the cloud sits 200 m from
        the origin: the anchor must come from the masked mean, or the
        padding drags it to ~half the offset and the f32 Gram loses the
        cancellation bound."""
        n_valid, n_pad = 600, 600
        R = _random_rotation(rng)
        t = rng.normal(size=3).astype(np.float32)
        src_v = (rng.uniform(-20, 20, (n_valid, 3)) + 200.0).astype(np.float32)
        tgt_v = src_v @ R.T + t
        n_out = 250
        tgt_v[:n_out] += rng.normal(size=(n_out, 3)).astype(np.float32) * 3
        src = np.concatenate([src_v, np.zeros((n_pad, 3), np.float32)])[None]
        tgt = np.concatenate([tgt_v, np.zeros((n_pad, 3), np.float32)])[None]
        mask = np.concatenate([np.ones(n_valid, bool), np.zeros(n_pad, bool)])[None]
        T0 = np.eye(4, dtype=np.float32)
        T0[:3, :3] = R
        T0[:3, 3] = t + 0.3

        model = PointDSC(refine_iters=20, inlier_threshold=0.6)
        jn = np.asarray(
            model.post_refinement(
                jnp.asarray(T0)[None], jnp.asarray(src), jnp.asarray(tgt),
                jnp.asarray(mask),
            )
        )
        fu = np.asarray(
            fused_post_refinement(
                jnp.asarray(T0)[None], jnp.asarray(src), jnp.asarray(tgt),
                jnp.asarray(mask), 1.2, 20, interpret=True,
            )
        )
        np.testing.assert_allclose(fu[:, :3, :3], jn[:, :3, :3], atol=1e-4)
        np.testing.assert_allclose(fu[:, :3, 3], jn[:, :3, 3], atol=2e-2)
        assert np.abs(fu[0, :3, :3] - R).max() < 1e-3
