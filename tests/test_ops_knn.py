"""Hierarchical exact top-k (ops/knn.py::exact_topk) vs full sort."""

import numpy as np
import jax
import jax.numpy as jnp




class TestExactTopk:
    """Hierarchical exact top-k must be indistinguishable from a full sort."""

    def test_matches_topk_chunked_path(self, rng):
        from pointdsc_tpu.ops.knn import exact_topk

        scores = jnp.asarray(rng.normal(size=(37, 4096)).astype(np.float32))
        idx = np.sort(np.asarray(exact_topk(scores, 40)), axis=-1)
        _, ref = jax.lax.top_k(scores, 40)
        np.testing.assert_array_equal(idx, np.sort(np.asarray(ref), axis=-1))

    def test_matches_topk_flat_fallback(self, rng):
        from pointdsc_tpu.ops.knn import exact_topk

        scores = jnp.asarray(rng.normal(size=(8, 1000)).astype(np.float32))
        idx = np.sort(np.asarray(exact_topk(scores, 12)), axis=-1)
        _, ref = jax.lax.top_k(scores, 12)
        np.testing.assert_array_equal(idx, np.sort(np.asarray(ref), axis=-1))

    def test_with_sentinel_masking(self, rng):
        """-1e9 masked entries (the NSM seed-dist convention) never win."""
        from pointdsc_tpu.ops.knn import exact_topk

        scores = rng.normal(size=(4, 2048)).astype(np.float32)
        scores[:, 100:2000] = -1e9
        idx = np.asarray(exact_topk(jnp.asarray(scores), 20))
        assert ((idx < 100) | (idx >= 2000)).all()

    def test_batched_leading_dims(self, rng):
        from pointdsc_tpu.ops.knn import exact_topk

        scores = jnp.asarray(rng.normal(size=(2, 5, 2048)).astype(np.float32))
        idx = np.sort(np.asarray(exact_topk(scores, 16)), axis=-1)
        _, ref = jax.lax.top_k(scores, 16)
        np.testing.assert_array_equal(idx, np.sort(np.asarray(ref), axis=-1))
