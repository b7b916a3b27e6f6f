"""SE(3), knn, power iteration, NMS, compatibility, matching unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pointdsc_tpu.ops import (
    transform,
    integrate_trans,
    decompose_trans,
    concatenate_trans,
    relative_rotation_error,
    feature_knn,
    pairwise_dists,
    power_iteration,
    pick_seeds_nms,
    pick_seeds_topk,
    spatial_consistency,
    feature_similarity,
    match_descriptors,
    inlier_labels,
)
from pointdsc_tpu.ops.se3 import inverse_trans, random_rotation


def rand_rot(rng):
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


class TestSE3:
    def test_transform_roundtrip(self, rng):
        R = rand_rot(rng)
        t = rng.normal(size=3)
        trans = integrate_trans(jnp.asarray(R), jnp.asarray(t))
        pts = jnp.asarray(rng.normal(size=(10, 3)))
        warped = transform(pts, trans)
        back = transform(warped, inverse_trans(trans))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-10)

    def test_concatenate(self, rng):
        T1 = integrate_trans(jnp.asarray(rand_rot(rng)), jnp.asarray(rng.normal(size=3)))
        T2 = integrate_trans(jnp.asarray(rand_rot(rng)), jnp.asarray(rng.normal(size=3)))
        np.testing.assert_allclose(
            np.asarray(concatenate_trans(T1, T2)), np.asarray(T1) @ np.asarray(T2), atol=1e-10
        )

    def test_batched(self, rng):
        R = jnp.asarray(np.stack([rand_rot(rng) for _ in range(5)]))
        t = jnp.asarray(rng.normal(size=(5, 3)))
        trans = integrate_trans(R, t)
        assert trans.shape == (5, 4, 4)
        Rd, td = decompose_trans(trans)
        np.testing.assert_allclose(np.asarray(Rd), np.asarray(R))
        pts = jnp.asarray(rng.normal(size=(5, 7, 3)))
        w = transform(pts, trans)
        expect = np.einsum("bij,bnj->bni", np.asarray(R), np.asarray(pts)) + np.asarray(t)[:, None]
        np.testing.assert_allclose(np.asarray(w), expect, atol=1e-10)

    def test_rotation_error(self, rng):
        R = jnp.asarray(rand_rot(rng))
        assert float(relative_rotation_error(R, R)) < 1e-3
        # 90 degree rotation about z
        Rz = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        np.testing.assert_allclose(float(relative_rotation_error(jnp.eye(3), Rz)), 90.0, atol=1e-4)

    def test_random_rotation_is_rotation(self):
        for axes in (0, 1, 3):
            R = np.asarray(random_rotation(jax.random.key(0), axes, 1.0))
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


class TestKnn:
    def test_matches_bruteforce(self, rng):
        x = rng.normal(size=(2, 50, 8)).astype(np.float32)
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        idx = feature_knn(jnp.asarray(x), k=5, normalized=True)
        d = np.linalg.norm(x[:, :, None] - x[:, None, :], axis=-1)
        expect = np.argsort(d, axis=-1)[..., :5]
        # compare neighbor *sets* (ties can reorder)
        assert (np.sort(np.asarray(idx), axis=-1) == np.sort(expect, axis=-1)).mean() > 0.99

    def test_ignore_self(self, rng):
        x = rng.normal(size=(1, 30, 4)).astype(np.float32)
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        idx = np.asarray(feature_knn(jnp.asarray(x), k=3, ignore_self=True))
        self_idx = np.arange(30)[None, :, None]
        assert not (idx == self_idx).any()

    def test_mask_excludes_invalid(self, rng):
        x = rng.normal(size=(1, 20, 4)).astype(np.float32)
        mask = np.ones((1, 20), dtype=bool)
        mask[0, 15:] = False
        idx = np.asarray(feature_knn(jnp.asarray(x), k=4, mask=jnp.asarray(mask)))
        assert (idx[0, :15] < 15).all()

    def test_pairwise_dists(self, rng):
        x = rng.normal(size=(3, 10, 3))
        d = np.asarray(pairwise_dists(jnp.asarray(x)))
        expect = np.linalg.norm(x[:, :, None] - x[:, None, :], axis=-1)
        np.testing.assert_allclose(d, expect, atol=1e-6)


class TestPowerIteration:
    def test_leading_eigenvector(self, rng):
        A = rng.normal(size=(4, 12, 12))
        M = np.abs(A @ np.swapaxes(A, -1, -2))  # nonneg symmetric
        v = np.asarray(power_iteration(jnp.asarray(M), num_iters=50))
        w_np, V_np = np.linalg.eigh(M)
        lead = V_np[..., -1]
        # compare up to sign
        cos = np.abs(np.einsum("bn,bn->b", v, lead) / np.linalg.norm(v, axis=-1))
        np.testing.assert_allclose(cos, 1.0, atol=1e-4)

    def test_jit_grad(self, rng):
        M = jnp.asarray(np.abs(rng.normal(size=(2, 8, 8))).astype(np.float32))
        M = M @ jnp.swapaxes(M, -1, -2)

        def f(M):
            return jnp.sum(power_iteration(M, 10) ** 2)

        g = jax.jit(jax.grad(f))(M)
        assert np.isfinite(np.asarray(g)).all()


class TestSeedSelection:
    def test_nms_suppresses_neighbors(self):
        # points on a line, scores descending; radius 1.5 suppresses adjacent
        pts = np.arange(6, dtype=np.float32)[:, None] * np.array([1.0, 0, 0])
        dists = np.linalg.norm(pts[:, None] - pts[None], axis=-1)[None]
        scores = jnp.asarray([[6.0, 1.0, 5.0, 1.0, 4.0, 1.0]])
        seeds = np.asarray(pick_seeds_nms(jnp.asarray(dists), scores, radius=1.5, max_num=3))
        # local maxima: 0 (beats 1), 2 (beats 1,3), 4 (beats 3,5) -> top3 = 0,2,4
        assert set(seeds[0].tolist()) == {0, 2, 4}

    def test_nms_mask(self):
        pts = np.arange(6, dtype=np.float32)[:, None] * np.array([1.0, 0, 0])
        dists = np.linalg.norm(pts[:, None] - pts[None], axis=-1)[None]
        scores = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 100.0, 100.0]])
        mask = jnp.asarray([[True, True, True, True, False, False]])
        seeds = np.asarray(
            pick_seeds_nms(jnp.asarray(dists), scores, radius=1.5, max_num=2, mask=mask)
        )
        assert (seeds < 4).all()

    def test_topk(self):
        scores = jnp.asarray([[0.1, 0.9, 0.5, 0.7]])
        seeds = np.asarray(pick_seeds_topk(scores, 2))
        assert seeds[0].tolist() == [1, 3]


class TestCompatibility:
    def test_spatial_consistency_rigid_pair(self, rng):
        """Inlier pairs under a rigid transform have compat 1 among themselves."""
        R = rand_rot(rng)
        t = rng.normal(size=3)
        src = rng.normal(size=(1, 20, 3))
        tgt = src @ R.T + t
        compat = np.asarray(spatial_consistency(jnp.asarray(src), jnp.asarray(tgt), 0.1))
        np.testing.assert_allclose(compat, 1.0, atol=1e-4)

    def test_spatial_consistency_outlier(self, rng):
        src = rng.normal(size=(1, 10, 3)).astype(np.float32)
        tgt = src.copy()
        tgt[0, 0] += 10.0  # one gross outlier
        compat = np.asarray(spatial_consistency(jnp.asarray(src), jnp.asarray(tgt), 0.1))
        assert compat[0, 0, 1:].max() < 1e-6
        np.testing.assert_allclose(compat[0, 1:, 1:], 1.0, atol=1e-4)

    def test_feature_similarity_diag_zero(self, rng):
        f = rng.normal(size=(1, 15, 8)).astype(np.float32)
        f = f / np.linalg.norm(f, axis=-1, keepdims=True)
        M = np.asarray(feature_similarity(jnp.asarray(f), jnp.asarray(1.0)))
        assert np.abs(np.diagonal(M, axis1=-2, axis2=-1)).max() == 0.0
        assert M.min() >= 0.0 and M.max() <= 1.0


class TestMatching:
    def test_match_and_labels(self, rng):
        R = rand_rot(rng)
        t = rng.normal(size=3)
        tgt_pts = rng.normal(size=(50, 3))
        perm = rng.permutation(50)
        desc = rng.normal(size=(50, 16))
        desc = desc / np.linalg.norm(desc, axis=-1, keepdims=True)
        src_desc = desc[perm]
        gt_trans_np = np.eye(4)
        gt_trans_np[:3, :3] = R
        gt_trans_np[:3, 3] = t
        # src points are the inverse-warped permuted tgt points
        src_pts = (tgt_pts[perm] - t) @ R  # R^-1 (x - t)
        corr, mask = match_descriptors(jnp.asarray(src_desc), jnp.asarray(desc), use_mutual=True)
        corr = np.asarray(corr)
        assert np.asarray(mask).all()
        assert (corr[:, 1] == perm).all()
        labels = inlier_labels(
            jnp.asarray(src_pts),
            jnp.asarray(tgt_pts[corr[:, 1]]),
            jnp.asarray(gt_trans_np),
            0.1,
        )
        np.testing.assert_allclose(np.asarray(labels), 1.0)

    def test_mutual_mask(self, rng):
        src = rng.normal(size=(10, 4)).astype(np.float32)
        tgt = rng.normal(size=(3, 4)).astype(np.float32)
        src /= np.linalg.norm(src, axis=-1, keepdims=True)
        tgt /= np.linalg.norm(tgt, axis=-1, keepdims=True)
        corr, mask = match_descriptors(jnp.asarray(src), jnp.asarray(tgt), use_mutual=True)
        # at most 3 mutual matches possible
        assert np.asarray(mask).sum() <= 3
