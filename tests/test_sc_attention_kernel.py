"""Fused SC-attention kernel vs the dense jnp reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointdsc_tpu.kernels.sc_attention import fused_sc_attention, pack_geometry
from pointdsc_tpu.ops.compatibility import spatial_consistency


def dense_reference(q, k, v, src, tgt, sigma_d, mask=None):
    """The materialized-compat attention exactly as NonLocalBlock computes it."""
    c = q.shape[-1]
    compat = spatial_consistency(src, tgt, sigma_d, mask=mask)
    logits = jnp.einsum("bnc,bmc->bnm", q, k) / jnp.sqrt(jnp.asarray(c, jnp.float32))
    scores = compat * logits
    if mask is not None:
        scores = jnp.where(mask[:, None, :], scores, -1e9)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", w, v)


class TestFusedSCAttention:
    def _make(self, rng, b=1, n=512, c=32):
        q = rng.normal(size=(b, n, c)).astype(np.float32)
        k = rng.normal(size=(b, n, c)).astype(np.float32)
        v = rng.normal(size=(b, n, c)).astype(np.float32)
        src = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
        tgt = (src + rng.normal(size=(b, n, 3)) * 0.05).astype(np.float32)
        return map(jnp.asarray, (q, k, v, src, tgt))

    def test_matches_dense(self, rng):
        q, k, v, src, tgt = self._make(rng)
        out = fused_sc_attention(
            q, k, v, src, tgt, 0.1, block_q=128, block_k=128, interpret=True
        )
        ref = dense_reference(q, k, v, src, tgt, 0.1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_masked_matches_dense(self, rng):
        q, k, v, src, tgt = self._make(rng, n=256)
        mask = jnp.asarray(np.arange(256) < 200)[None]
        out = fused_sc_attention(
            q, k, v, src, tgt, 0.1, mask=mask,
            block_q=128, block_k=128, interpret=True,
        )
        ref = dense_reference(q, k, v, src, tgt, 0.1, mask=mask)
        np.testing.assert_allclose(
            np.asarray(out)[:, :200], np.asarray(ref)[:, :200], atol=2e-5
        )

    def test_batched(self, rng):
        q, k, v, src, tgt = self._make(rng, b=3, n=256)
        out = fused_sc_attention(
            q, k, v, src, tgt, 0.1, block_q=128, block_k=128, interpret=True
        )
        ref = dense_reference(q, k, v, src, tgt, 0.1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pack_geometry(self, rng):
        src = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        g = pack_geometry(src, tgt, None)
        assert g.shape == (16, 10)
        np.testing.assert_allclose(np.asarray(g[0:3]), np.asarray(src.T))
        np.testing.assert_allclose(
            np.asarray(g[3]), np.sum(np.asarray(src) ** 2, -1), rtol=1e-6
        )
