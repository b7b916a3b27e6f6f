"""Fused NMS kernel vs the matrix-parallel reference implementation."""

import numpy as np
import jax.numpy as jnp

from pointdsc_tpu.kernels.nms import nms_local_max, pick_seeds_nms_fused
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
