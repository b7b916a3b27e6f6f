"""Tiled NN-search kernel (kernels/nn_search.py) vs brute-force argmin."""

import numpy as np
import jax.numpy as jnp

from pointdsc_tpu.kernels.nn_search import nearest_neighbors


class TestNearestNeighbors:
    def test_matches_bruteforce(self, rng):
        q = rng.uniform(-2, 2, (700, 3)).astype(np.float32)
        b = rng.uniform(-2, 2, (900, 3)).astype(np.float32)
        d2, idx = nearest_neighbors(jnp.asarray(q), jnp.asarray(b),
                                    interpret=True)
        full = np.sum((q[:, None] - b[None]) ** 2, axis=-1)
        ref_idx = np.argmin(full, axis=1)
        ref_d2 = full[np.arange(len(q)), ref_idx]
        # tie/LSB reassociation can flip argmin on near-equal distances;
        # the distances themselves must agree
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-4,
                                   atol=1e-5)
        agree = (np.asarray(idx) == ref_idx).mean()
        assert agree > 0.999

    def test_masked_base_never_selected(self, rng):
        q = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
        mask = np.zeros(512, bool)
        mask[300:] = True  # only the tail is valid
        _, idx = nearest_neighbors(jnp.asarray(q), jnp.asarray(b),
                                   jnp.asarray(mask), interpret=True)
        assert (np.asarray(idx) >= 300).all()

    def test_icp_refines_with_kernel_path(self, rng):
        """ICP through nearest_neighbors converges the same way as the
        matmul-argmin path (exercised via the interpret kernel)."""
        from pointdsc_tpu.ops.icp import icp_point_to_point
        from scipy.spatial.transform import Rotation

        src = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
        R = Rotation.from_rotvec([0.03, -0.02, 0.04]).as_matrix().astype(
            np.float32
        )
        t = np.array([0.05, -0.03, 0.02], np.float32)
        tgt = src @ R.T + t
        trans, fitness, rmse = icp_point_to_point(
            jnp.asarray(src), jnp.asarray(tgt), jnp.eye(4),
            max_correspondence_distance=0.3,
        )
        assert float(fitness) > 0.95
        np.testing.assert_allclose(np.asarray(trans)[:3, :3], R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(trans)[:3, 3], t, atol=1e-3)
