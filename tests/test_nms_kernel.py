"""Fused NMS kernel vs the matrix-parallel reference implementation."""

import numpy as np
import jax.numpy as jnp

from pointdsc_tpu.kernels.nms import (
    nms_local_max,
    pick_seeds_nms_fused,
    pick_seeds_nms_prefiltered,
)
from pointdsc_tpu.ops.knn import pairwise_dists
from pointdsc_tpu.ops.nms import pick_seeds_nms


class TestFusedNMS:
    def test_local_max_matches_dense(self, rng):
        n = 256
        src = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
        scores = jnp.asarray(rng.normal(size=(1, n)).astype(np.float32))
        flags = np.asarray(
            nms_local_max(src, scores, 0.3, block_q=128, block_k=128,
                          interpret=True)
        )
        dists = pairwise_dists(src)
        rel = np.asarray(scores)[0][:, None] >= np.asarray(scores)[0][None, :]
        free = rel | (np.asarray(dists)[0] >= 0.3)
        expect = free.all(axis=-1).astype(np.float32)
        np.testing.assert_array_equal(flags[0], expect)

    def test_seeds_match_reference_op(self, rng):
        n = 256
        src = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
        scores = jnp.asarray(rng.normal(size=(1, n)).astype(np.float32))
        mask = jnp.asarray(np.arange(n) < 200)[None]
        seeds_fused = np.asarray(
            pick_seeds_nms_fused(src, scores, 0.3, 20, mask=mask, interpret=True)
        )
        dists = pairwise_dists(src)
        seeds_ref = np.asarray(
            pick_seeds_nms(dists, scores, 0.3, 20, mask=mask)
        )
        assert set(seeds_fused[0].tolist()) == set(seeds_ref[0].tolist())

    def test_prefiltered_matches_full(self, rng):
        """Top-M prefilter returns the exact full-N selection (certificate
        path), incl. under masking."""
        n, s = 4096, 128
        src = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
        scores = jnp.asarray(rng.uniform(0.01, 1.0, (1, n)).astype(np.float32))
        mask = jnp.asarray(np.arange(n) < 3500)[None]
        pre = np.asarray(pick_seeds_nms_prefiltered(
            src, scores, 0.2, s, mask=mask, prefilter=1024, interpret=True))
        full = np.asarray(pick_seeds_nms_fused(
            src, scores, 0.2, s, mask=mask, interpret=True))
        np.testing.assert_array_equal(pre, full)

    def test_prefiltered_fallback_when_maxima_scarce(self, rng):
        """A dense cluster suppresses nearly everything: the certificate
        fails (selected keys hit the zero tier) and the lax.cond fallback
        must reproduce the full-N result exactly."""
        n, s = 2048, 256
        # all points inside one NMS ball -> a single local max
        src = jnp.asarray(rng.uniform(-0.01, 0.01, (1, n, 3)).astype(np.float32))
        scores = jnp.asarray(rng.uniform(0.01, 1.0, (1, n)).astype(np.float32))
        pre = np.asarray(pick_seeds_nms_prefiltered(
            src, scores, 0.2, s, prefilter=1024, interpret=True))
        full = np.asarray(pick_seeds_nms_fused(
            src, scores, 0.2, s, interpret=True))
        np.testing.assert_array_equal(pre, full)

    def test_prefiltered_all_negative_scores(self, rng):
        """All-negative confidence logits (e.g. an untrained model): every
        suppressed point's key is +/-0.0 and outranks every raw score, a
        tie regime the subset provably cannot certify. The positivity
        precheck must route straight to the full kernel and the result
        must equal the full-N selection exactly."""
        n, s = 4096, 128
        src = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
        scores = jnp.asarray(
            rng.uniform(-1.0, -0.01, (1, n)).astype(np.float32))
        pre = np.asarray(pick_seeds_nms_prefiltered(
            src, scores, 0.2, s, prefilter=1024, interpret=True))
        full = np.asarray(pick_seeds_nms_fused(
            src, scores, 0.2, s, interpret=True))
        np.testing.assert_array_equal(pre, full)

    def test_prefiltered_small_n_delegates(self, rng):
        n, s = 512, 16
        src = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
        scores = jnp.asarray(rng.normal(size=(1, n)).astype(np.float32))
        pre = np.asarray(pick_seeds_nms_prefiltered(
            src, scores, 0.3, s, interpret=True))
        full = np.asarray(pick_seeds_nms_fused(
            src, scores, 0.3, s, interpret=True))
        np.testing.assert_array_equal(pre, full)
