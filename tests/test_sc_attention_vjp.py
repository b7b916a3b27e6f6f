"""Custom-VJP fused attention: gradients vs the dense reference (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointdsc_tpu.kernels.sc_attention import (
    pack_geometry,
    sc_attention_trainable,
)
from tests.test_sc_attention_kernel import dense_reference


def _make(rng, n=256, c=32):
    q = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    tgt = src + jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)) * 0.05
    return q, k, v, src, tgt


class TestTrainableAttention:
    def test_forward_matches_dense(self, rng):
        q, k, v, src, tgt = _make(rng)
        geom = pack_geometry(src, tgt, None)
        out = sc_attention_trainable(q, k, v, geom, 0.1, 128, 128, True)
        ref = dense_reference(q[None], k[None], v[None], src[None], tgt[None], 0.1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[0], atol=2e-5)

    def test_gradients_match_dense(self, rng):
        q, k, v, src, tgt = _make(rng, n=128, c=16)
        geom = pack_geometry(src, tgt, None)
        w = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))

        def loss_fused(q, k, v):
            out = sc_attention_trainable(q, k, v, geom, 0.1, 128, 128, True)
            return jnp.sum(out * w)

        def loss_dense(q, k, v):
            out = dense_reference(
                q[None], k[None], v[None], src[None], tgt[None], 0.1
            )[0]
            return jnp.sum(out * w)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gd, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_masked_gradients(self, rng):
        q, k, v, src, tgt = _make(rng, n=128, c=16)
        mask = jnp.asarray(np.arange(128) < 100)
        geom = pack_geometry(src, tgt, mask)
        w = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))
        w = w * mask[:, None]

        def loss_fused(q, k, v):
            out = sc_attention_trainable(q, k, v, geom, 0.1, 128, 128, True)
            return jnp.sum(out * w)

        def loss_dense(q, k, v):
            out = dense_reference(
                q[None], k[None], v[None], src[None], tgt[None], 0.1,
                mask=mask[None],
            )[0]
            return jnp.sum(out * w)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
