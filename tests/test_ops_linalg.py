"""Jacobi eigensolver + Horn Procrustes validated against LAPACK (numpy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointdsc_tpu.ops.linalg import jacobi_eigh, symeig3x3, symeig4x4
from pointdsc_tpu.ops.procrustes import weighted_procrustes, rotation_from_covariance
from pointdsc_tpu.ops.se3 import transform, integrate_trans, decompose_trans


def random_rotation_np(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def svd_procrustes_np(src, tgt, w):
    """Reference construction: SVD with det-sign fix (common.py:23-45)."""
    wsum = w.sum() + 1e-6
    ca = (src * w[:, None]).sum(0) / wsum
    cb = (tgt * w[:, None]).sum(0) / wsum
    H = (src - ca).T @ np.diag(w) @ (tgt - cb)
    U, S, Vt = np.linalg.svd(H)
    V = Vt.T
    d = np.sign(np.linalg.det(V @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = V @ D @ U.T
    t = cb - R @ ca
    return R, t


class TestJacobiEigh:
    @pytest.mark.parametrize("n", [3, 4])
    def test_matches_lapack(self, rng, n):
        A = rng.normal(size=(64, n, n)).astype(np.float64)
        A = A + np.swapaxes(A, -1, -2)
        w, V = jacobi_eigh(jnp.asarray(A))
        w_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-8)
        # eigenvector property: A v = w v
        Av = np.einsum("bij,bjk->bik", A, np.asarray(V))
        wV = np.asarray(V) * np.asarray(w)[:, None, :]
        np.testing.assert_allclose(Av, wV, atol=1e-7)

    def test_degenerate_repeated_eigs(self):
        A = jnp.broadcast_to(jnp.eye(3) * 2.0, (4, 3, 3))
        w, V = symeig3x3(A)
        np.testing.assert_allclose(np.asarray(w), 2.0, atol=1e-10)
        # columns remain orthonormal
        VtV = np.einsum("bij,bik->bjk", np.asarray(V), np.asarray(V))
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-10)

    def test_zero_matrix(self):
        w, V = symeig4x4(jnp.zeros((2, 4, 4)))
        assert np.isfinite(np.asarray(w)).all()
        assert np.isfinite(np.asarray(V)).all()


class TestProcrustes:
    def test_exact_recovery(self, rng):
        for _ in range(10):
            R = random_rotation_np(rng)
            t = rng.normal(size=3)
            src = rng.normal(size=(50, 3))
            tgt = src @ R.T + t
            trans = weighted_procrustes(jnp.asarray(src)[None], jnp.asarray(tgt)[None])
            Rj, tj = decompose_trans(trans)
            np.testing.assert_allclose(np.asarray(Rj)[0], R, atol=1e-5)
            np.testing.assert_allclose(np.asarray(tj)[0, :, 0], t, atol=1e-5)

    def test_weighted_matches_svd_reference(self, rng):
        """Noisy weighted fits must agree with the SVD+det-fix construction."""
        for _ in range(20):
            src = rng.normal(size=(40, 3))
            R = random_rotation_np(rng)
            t = rng.normal(size=3)
            tgt = src @ R.T + t + rng.normal(size=(40, 3)) * 0.05
            w = rng.uniform(0.0, 1.0, size=40)
            R_np, t_np = svd_procrustes_np(src, tgt, w)
            trans = weighted_procrustes(
                jnp.asarray(src)[None], jnp.asarray(tgt)[None], jnp.asarray(w)[None]
            )
            Rj, tj = decompose_trans(trans)
            np.testing.assert_allclose(np.asarray(Rj)[0], R_np, atol=1e-4)
            np.testing.assert_allclose(np.asarray(tj)[0, :, 0], t_np, atol=1e-4)

    def test_reflection_case(self, rng):
        """Anti-correlated clouds force the det fix; Horn must agree."""
        src = rng.normal(size=(30, 3))
        tgt = -src + rng.normal(size=(30, 3)) * 0.01  # reflection-ish map
        w = np.ones(30)
        R_np, t_np = svd_procrustes_np(src, tgt, w)
        assert np.linalg.det(R_np) > 0.99  # reference yields proper rotation
        trans = weighted_procrustes(jnp.asarray(src)[None], jnp.asarray(tgt)[None])
        Rj, _ = decompose_trans(trans)
        np.testing.assert_allclose(np.linalg.det(np.asarray(Rj)[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rj)[0], R_np, atol=1e-3)

    def test_zero_weights_masked_points_ignored(self, rng):
        R = random_rotation_np(rng)
        t = rng.normal(size=3)
        src = rng.normal(size=(60, 3))
        tgt = src @ R.T + t
        # corrupt half the points but zero their weights
        tgt_corrupt = tgt.copy()
        tgt_corrupt[30:] = rng.normal(size=(30, 3)) * 10
        w = np.concatenate([np.ones(30), np.zeros(30)])
        trans = weighted_procrustes(
            jnp.asarray(src)[None], jnp.asarray(tgt_corrupt)[None], jnp.asarray(w)[None]
        )
        Rj, tj = decompose_trans(trans)
        np.testing.assert_allclose(np.asarray(Rj)[0], R, atol=1e-5)

    def test_batched_and_jittable(self, rng):
        src = jnp.asarray(rng.normal(size=(8, 40, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(8, 40, 3)).astype(np.float32))
        w = jnp.asarray(rng.uniform(size=(8, 40)).astype(np.float32))
        trans = jax.jit(weighted_procrustes)(src, tgt, w)
        assert trans.shape == (8, 4, 4)
        R = np.asarray(trans)[:, :3, :3]
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", R, R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-4
        )

    @pytest.mark.slow
    def test_gradients_finite(self, rng):
        src = jnp.asarray(rng.normal(size=(1, 20, 3)).astype(np.float32))
        R = random_rotation_np(rng)
        tgt = jnp.asarray((np.asarray(src)[0] @ R.T + 0.01 * rng.normal(size=(20, 3))).astype(np.float32))[None]

        def loss(w):
            trans = weighted_procrustes(src, tgt, w)
            return jnp.sum((transform(src, trans) - tgt) ** 2)

        g = jax.grad(loss)(jnp.ones((1, 20)) * 0.5)
        assert np.isfinite(np.asarray(g)).all()

    def test_rotation_from_covariance_identity(self):
        R = rotation_from_covariance(jnp.eye(3)[None])
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)


class TestDominantEigvec4x4:
    """Newton-on-quartic dominant eigenpair vs LAPACK (the fast path used
    by weighted_procrustes(method="newton") inside refinement loops)."""

    def test_matches_lapack(self, rng):
        from pointdsc_tpu.ops.linalg import dominant_eigvec4x4

        A = rng.normal(size=(500, 4, 4)).astype(np.float32)
        A = 0.5 * (A + A.transpose(0, 2, 1))
        lam, v = jax.jit(dominant_eigvec4x4)(jnp.asarray(A))
        w_ref, V_ref = np.linalg.eigh(A.astype(np.float64))
        align = np.abs(np.sum(np.asarray(v) * V_ref[:, :, -1], axis=-1))
        assert align.min() > 1.0 - 1e-5
        rel = np.abs(np.asarray(lam) - w_ref[:, -1]) / np.maximum(
            np.abs(w_ref[:, -1]), 1e-6
        )
        assert rel.max() < 5e-3  # near-double roots converge linearly

    def test_large_scale_entries(self, rng):
        """KITTI-magnitude covariance sums (~1e7) must not overflow f32."""
        from pointdsc_tpu.ops.linalg import dominant_eigvec4x4

        A = rng.normal(size=(64, 4, 4)).astype(np.float32) * 3e7
        A = 0.5 * (A + A.transpose(0, 2, 1))
        lam, v = dominant_eigvec4x4(jnp.asarray(A))
        assert np.isfinite(np.asarray(lam)).all()
        w_ref, V_ref = np.linalg.eigh(A.astype(np.float64))
        align = np.abs(np.sum(np.asarray(v) * V_ref[:, :, -1], axis=-1))
        assert align.min() > 1.0 - 1e-5

    def test_zero_matrix_fallback(self):
        from pointdsc_tpu.ops.linalg import dominant_eigvec4x4

        lam, v = dominant_eigvec4x4(jnp.zeros((2, 4, 4)))
        assert np.isfinite(np.asarray(v)).all()
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0)

    def test_gradients_finite(self, rng):
        from pointdsc_tpu.ops.linalg import dominant_eigvec4x4

        A = rng.normal(size=(4, 4)).astype(np.float32)
        A = 0.5 * (A + A.T)

        def loss(a):
            lam, v = dominant_eigvec4x4(a)
            return lam + jnp.sum(v**2 * jnp.arange(4.0))

        g = jax.grad(loss)(jnp.asarray(A))
        assert np.isfinite(np.asarray(g)).all()

    def test_newton_refinement_equals_jacobi_refinement(self, rng):
        """The two procrustes methods must agree through an IRLS-style loop."""
        R = random_rotation_np(rng)
        t = rng.normal(size=3)
        src = rng.normal(size=(200, 3)).astype(np.float32)
        tgt = (src @ R.T + t).astype(np.float32)
        tgt[:60] += rng.normal(size=(60, 3)).astype(np.float32)  # outliers

        def refine(method):
            trans = jnp.eye(4)
            for _ in range(5):
                warped = src @ trans[:3, :3].T + trans[:3, 3]
                dist = jnp.linalg.norm(warped - jnp.asarray(tgt), axis=-1)
                w = (dist < 0.5).astype(jnp.float32) / (1.0 + (dist / 0.5) ** 2)
                trans = weighted_procrustes(
                    jnp.asarray(src), jnp.asarray(tgt), w, method=method
                )
            return np.asarray(trans)

        np.testing.assert_allclose(refine("newton"), refine("jacobi"), atol=1e-4)
