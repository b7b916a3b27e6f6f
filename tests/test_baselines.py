"""Classical baselines: recovery on planted synthetic registrations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointdsc_tpu.baselines import (
    least_squares_fit,
    pmc_registration,
    ransac_registration,
    spectral_matching,
)
from pointdsc_tpu.ops.se3 import decompose_trans, relative_rotation_error
from tests.test_model import make_synthetic_pair


def check_recovery(trans, gt, re_tol=2.0, te_tol=0.05):
    R_pred, t_pred = decompose_trans(jnp.asarray(trans))
    re = float(relative_rotation_error(R_pred, jnp.asarray(gt[..., :3, :3])))
    te = float(np.linalg.norm(np.asarray(t_pred).reshape(-1) - gt[..., :3, 3].reshape(-1)))
    assert re < re_tol, f"RE={re}"
    assert te < te_tol, f"TE={te}"


class TestSpectralMatching:
    def test_recovers_transform(self, rng):
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=200, inlier_ratio=0.6)
        trans, labels = spectral_matching(
            jnp.asarray(src)[None], jnp.asarray(tgt)[None], 0.10
        )
        check_recovery(trans[0], gt)
        # selected inliers should be mostly true inliers
        prec = (np.asarray(labels)[0] * lab).sum() / np.asarray(labels)[0].sum()
        assert prec > 0.8


class TestRansac:
    def test_recovers_transform(self, rng):
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=200, inlier_ratio=0.4)
        trans, labels = ransac_registration(
            jnp.asarray(src)[None],
            jnp.asarray(tgt)[None],
            jax.random.key(0),
            inlier_threshold=0.10,
            num_hypotheses=1024,
        )
        check_recovery(trans[0], gt)
        recall = (np.asarray(labels)[0] * lab).sum() / lab.sum()
        assert recall > 0.9

    def test_low_inlier_ratio(self, rng):
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=300, inlier_ratio=0.15)
        trans, _ = ransac_registration(
            jnp.asarray(src)[None],
            jnp.asarray(tgt)[None],
            jax.random.key(1),
            inlier_threshold=0.10,
            num_hypotheses=8192,
        )
        check_recovery(trans[0], gt, re_tol=3.0, te_tol=0.08)


class TestLeastSquares:
    def test_gt_inlier_fit(self, rng):
        cp, src, tgt, gt, lab = make_synthetic_pair(
            rng, n=200, inlier_ratio=0.5, noise=0.001
        )
        trans, _ = least_squares_fit(
            jnp.asarray(src)[None], jnp.asarray(tgt)[None], jnp.asarray(lab)[None]
        )
        # affine fit on near-noiseless inliers approximates the rigid gt
        np.testing.assert_allclose(np.asarray(trans)[0], gt, atol=0.02)


class TestPMC:
    def test_recovers_transform(self, rng):
        cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=80, inlier_ratio=0.5)
        trans, labels = pmc_registration(src, tgt, inlier_threshold=0.10)
        check_recovery(trans, gt)
        prec = (labels * lab).sum() / max(labels.sum(), 1)
        assert prec > 0.9


class TestGCRansac:
    @pytest.mark.slow
    def test_recovers_transform(self, rng):
        """GC-RANSAC recovers a planted rigid transform and its spatially
        coherent labeling beats thresholding on clustered outliers."""
        import jax
        import jax.numpy as jnp

        from pointdsc_tpu.baselines import gc_ransac_registration
        from pointdsc_tpu.data import transforms_np as T

        n = 256
        src = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
        gt = T.integrate_trans(T.rotation_matrix(3, 0.5, rng),
                               T.translation_matrix(0.3, rng))
        inl = rng.random(n) < 0.3
        tgt = np.where(
            inl[:, None],
            T.transform(src, gt) + rng.normal(size=(n, 3)) * 0.005,
            rng.uniform(-1.0, 1.0, (n, 3)),
        ).astype(np.float32)

        trans, labels = gc_ransac_registration(
            jnp.asarray(src)[None], jnp.asarray(tgt)[None],
            jax.random.key(3), inlier_threshold=0.10, num_hypotheses=2048,
        )
        trans = np.asarray(trans)[0]
        re = np.degrees(np.arccos(np.clip(
            (np.trace(trans[:3, :3].T @ gt[:3, :3]) - 1) / 2, -1, 1)))
        te = np.linalg.norm(trans[:3, 3] - gt[:3, 3])
        assert re < 2.0 and te < 0.05, (re, te)
        # labeling quality: most planted inliers found, few false positives
        lab = np.asarray(labels)[0] > 0
        recall = (lab & inl).sum() / max(inl.sum(), 1)
        precision = (lab & inl).sum() / max(lab.sum(), 1)
        assert recall > 0.8 and precision > 0.8, (recall, precision)

    @pytest.mark.slow
    def test_masked_padding(self, rng):
        import jax
        import jax.numpy as jnp

        from pointdsc_tpu.baselines import gc_ransac_registration
        from pointdsc_tpu.data import transforms_np as T

        n, pad = 200, 56
        src = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
        gt = T.integrate_trans(T.rotation_matrix(3, 0.5, rng),
                               T.translation_matrix(0.3, rng))
        inl = rng.random(n) < 0.4
        tgt = np.where(
            inl[:, None], T.transform(src, gt),
            rng.uniform(-1.0, 1.0, (n, 3)),
        ).astype(np.float32)
        pz = lambda a: np.pad(a, ((0, pad), (0, 0)))
        mask = np.arange(n + pad) < n

        trans, labels = gc_ransac_registration(
            jnp.asarray(pz(src))[None], jnp.asarray(pz(tgt))[None],
            jax.random.key(3), inlier_threshold=0.10, num_hypotheses=2048,
            mask=jnp.asarray(mask)[None],
        )
        # padded entries are never labeled inliers
        assert np.asarray(labels)[0, n:].sum() == 0
        trans = np.asarray(trans)[0]
        te = np.linalg.norm(trans[:3, 3] - gt[:3, 3])
        assert te < 0.05


class TestCoherenceICMvsExact:
    """Quantifies the ICM-vs-exact-graph-cut approximation (VERDICT r2 #6).

    The reference (baseline_scripts/baseline_3DMatch.py:101-123) runs a true
    s-t mincut via pygcransac; our gc_ransac_registration minimizes the same
    Barath & Matas coherence energy with parallel ICM sweeps. These tests
    enumerate all 2^N labelings on small instances and measure how often ICM
    attains the global minimum at the reference's lambda=0.1.
    """

    N, K, LAM = 14, 4, 0.1

    def _exact_min(self, r2, nbr, nbr_valid):
        import itertools

        n = r2.shape[0]
        c_in = np.minimum(r2, 1.0)
        c_out = np.maximum(1.0 - r2, 0.0)
        best_e, best_l = np.inf, None
        for bits in itertools.product([0, 1], repeat=n):
            lab = np.array(bits, float)
            e = np.sum(lab * c_in + (1 - lab) * c_out) + self.LAM * 0.5 * np.sum(
                np.abs(lab[:, None] - lab[nbr]) * nbr_valid
            )
            if e < best_e - 1e-12:
                best_e, best_l = e, lab
        return best_e, best_l

    def _run(self, residual_fn, trials, seed):
        from pointdsc_tpu.baselines.classical import coherence_icm
        from pointdsc_tpu.ops.knn import pairwise_dists

        rng = np.random.default_rng(seed)
        n, k = self.N, self.K
        label_agree, ratios = 0, []
        for _ in range(trials):
            pts = rng.normal(size=(n, 3))
            r2 = residual_fn(rng, n) ** 2
            d = np.array(pairwise_dists(jnp.asarray(pts[None]))[0])
            d += np.eye(n) * 1e9
            nbr = np.argsort(d, axis=1)[:, :k]
            nv = np.ones((n, k), bool)
            e_icm, l_icm = coherence_icm(
                jnp.asarray(r2[None]),
                jnp.asarray(nbr[None]),
                jnp.asarray(nv[None]),
                jnp.ones((1, n), bool),
                self.LAM,
            )
            e_ex, l_ex = self._exact_min(r2, nbr, nv)
            if np.array_equal(np.asarray(l_icm[0]).astype(float), l_ex):
                label_agree += 1
            ratios.append(float(e_icm[0]) / max(e_ex, 1e-9))
        return label_agree, np.array(ratios)

    def test_bimodal_residuals_match_exact_cut(self):
        """RANSAC-regime residuals (inliers well under tau, outliers well
        over): ICM must find the exact global minimum essentially always
        (measured 100% over 100 seeds at authoring time; asserted >= 95%
        over 30 here for runtime)."""

        def bimodal(rng, n):
            inl = rng.random(n) < 0.4
            return np.where(
                inl, rng.uniform(0, 0.5, n), rng.uniform(1.5, 4.0, n)
            )

        agree, ratios = self._run(bimodal, trials=30, seed=0)
        assert agree >= 29, f"ICM matched exact cut on only {agree}/30"
        assert ratios.max() <= 1.0 + 1e-6

    def test_adversarial_residuals_bounded_suboptimality(self):
        """Residuals uniformly straddling the threshold (worst case for a
        local minimizer): labelings may differ, but the energy must stay
        within 10% of the exhaustive optimum and never beat it (sanity:
        both evaluate the same energy)."""

        def uniform(rng, n):
            return rng.uniform(0.0, 2.0, n)

        agree, ratios = self._run(uniform, trials=30, seed=1)
        assert agree >= 20, f"only {agree}/30 exact even adversarially"
        assert ratios.min() >= 1.0 - 1e-6  # never below the true minimum
        assert ratios.max() <= 1.10, f"worst energy ratio {ratios.max():.3f}"


class TestCoherenceMincut:
    """The native exact s-t mincut (native/maxflow.cpp) — GC-RANSAC's
    `minimizer="exact"` path. The reference's pygcransac performs this cut
    internally (baseline_scripts/baseline_3DMatch.py:101-123)."""

    LAM = 0.1

    def test_matches_exhaustive_enumeration(self):
        """The cut's energy and labeling equal brute-force minimization of
        the SAME energy formula the ICM tests enumerate (N=12, all 2^N)."""
        import itertools

        from pointdsc_tpu.baselines.classical import coherence_mincut

        rng = np.random.default_rng(7)
        n, k = 12, 4
        for _ in range(20):
            r2 = rng.uniform(0.0, 2.0, n) ** 2
            pts = rng.normal(size=(n, 3))
            d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
            d += np.eye(n) * 1e9
            nbr = np.argsort(d, axis=1)[:, :k]
            nv = np.ones((n, k), bool)
            e_cut, l_cut = coherence_mincut(
                r2[None], nbr[None], nv[None], np.ones((1, n), bool), self.LAM
            )
            c_in = np.minimum(r2, 1.0)
            c_out = np.maximum(1.0 - r2, 0.0)
            best_e = np.inf
            for bits in itertools.product([0, 1], repeat=n):
                lab = np.array(bits, float)
                e = np.sum(lab * c_in + (1 - lab) * c_out) + (
                    self.LAM * 0.5
                ) * np.sum(np.abs(lab[:, None] - lab[nbr]) * nv)
                best_e = min(best_e, e)
            got = np.sum(
                np.where(l_cut[0], c_in, c_out)
            ) + (self.LAM * 0.5) * np.sum(
                np.abs(l_cut[0][:, None].astype(float) - l_cut[0][nbr]) * nv
            )
            assert abs(e_cut[0] - best_e) < 1e-6, (e_cut[0], best_e)
            assert abs(got - best_e) < 1e-6  # returned labels attain it

    def test_lower_bounds_icm_at_scale(self):
        """At N=400 (beyond enumeration): the exact cut's energy is never
        above ICM's, and ICM stays within 10% — the large-instance version
        of the ICM-approximation claim."""
        from pointdsc_tpu.baselines.classical import (
            coherence_icm,
            coherence_mincut,
        )

        rng = np.random.default_rng(11)
        n, k = 400, 8
        for regime in ("bimodal", "uniform"):
            if regime == "bimodal":
                inl = rng.random(n) < 0.4
                r = np.where(inl, rng.uniform(0, 0.5, n), rng.uniform(1.5, 4.0, n))
            else:
                r = rng.uniform(0.0, 2.0, n)
            r2 = r**2
            pts = rng.normal(size=(n, 3))
            d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
            d += np.eye(n) * 1e9
            nbr = np.argsort(d, axis=1)[:, :k]
            nv = np.ones((n, k), bool)
            mask = np.ones((1, n), bool)
            e_cut, _ = coherence_mincut(r2[None], nbr[None], nv[None], mask,
                                        self.LAM)
            e_icm, _ = coherence_icm(
                jnp.asarray(r2[None]), jnp.asarray(nbr[None]),
                jnp.asarray(nv[None]), jnp.asarray(mask), self.LAM,
            )
            assert e_cut[0] <= float(e_icm[0]) + 1e-5, regime
            assert float(e_icm[0]) <= e_cut[0] * 1.10, regime

    def test_gc_ransac_exact_minimizer_recovers(self, rng):
        """gc_ransac_registration(minimizer='exact') routes the labeling
        through the native cut (jax.pure_callback) and still recovers the
        planted transform with a high-quality labeling."""
        from pointdsc_tpu.baselines import gc_ransac_registration
        from pointdsc_tpu.data import transforms_np as T

        n = 300
        src = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
        gt = T.integrate_trans(T.rotation_matrix(3, 0.5, rng),
                               T.translation_matrix(0.3, rng))
        inl = rng.random(n) < 0.3
        tgt = np.where(
            inl[:, None],
            T.transform(src, gt) + rng.normal(size=(n, 3)) * 0.005,
            rng.uniform(-1.0, 1.0, (n, 3)),
        ).astype(np.float32)

        # spatial_coherence_weight passed EXPLICITLY: it is a traced jit
        # argument, and the exact path must ship it to the host callback as
        # an operand (regression: closing over it leaked the tracer)
        trans, labels = gc_ransac_registration(
            jnp.asarray(src)[None], jnp.asarray(tgt)[None],
            jax.random.key(3), inlier_threshold=0.10, num_hypotheses=2048,
            spatial_coherence_weight=0.1, minimizer="exact",
        )
        trans = np.asarray(trans)[0]
        re = np.degrees(np.arccos(np.clip(
            (np.trace(trans[:3, :3].T @ gt[:3, :3]) - 1) / 2, -1, 1)))
        te = np.linalg.norm(trans[:3, 3] - gt[:3, 3])
        assert re < 2.0 and te < 0.05, (re, te)
        lab = np.asarray(labels)[0] > 0
        recall = (lab & inl).sum() / max(inl.sum(), 1)
        precision = (lab & inl).sum() / max(lab.sum(), 1)
        assert recall > 0.8 and precision > 0.8, (recall, precision)
