"""Cached-compat fused attention vs dense + full-model equivalence."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from pointdsc_tpu.kernels.sc_attention import fused_sc_attention_cached
from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.ops.compatibility import spatial_consistency
from tests.test_sc_attention_kernel import dense_reference
from tests.test_model import make_synthetic_pair


def test_cached_kernel_matches_dense(rng):
    b, n, c = 1, 256, 32
    q = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    tgt = src + jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 0.05
    compat = spatial_consistency(src, tgt, 0.1)  # f32 cache for exactness
    out = fused_sc_attention_cached(
        q, k, v, compat, src, tgt, block_q=128, block_k=128, interpret=True
    )
    ref = dense_reference(q, k, v, src, tgt, 0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_offset_softmax_extreme_norms(rng):
    """Offset-softmax validity regime (see the kernel docstring).

    scale=3 puts the Cauchy-Schwarz bound around ~50 nats with slack well
    under the e^-80 floor: the kernel must agree with the dense softmax
    (a naive exp(s) without the offset could already overflow here for
    adversarial rows). scale=30 is far out of regime (slack in the
    thousands of nats): weights legitimately degrade toward uniform, but
    the output must remain FINITE — never the 0/0 rows a floorless
    offset underflow would produce."""
    b, n, c = 1, 256, 32
    src = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    tgt = src + jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 0.05
    compat = spatial_consistency(src, tgt, 0.1)
    v = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    for scale, check_values in [(3.0, True), (30.0, False)]:
        q = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)) * scale
        k = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)) * scale
        out = np.asarray(fused_sc_attention_cached(
            q, k, v, compat, src, tgt, block_q=128, block_k=128,
            interpret=True,
        ))
        assert np.isfinite(out).all(), f"non-finite at scale {scale}"
        if check_values:
            ref = np.asarray(dense_reference(q, k, v, src, tgt, 0.1))
            # bf16 streams dominate the error; the offset itself is exact
            np.testing.assert_allclose(out, ref,
                                       atol=2e-2 * float(np.abs(ref).max()))


def test_offset_softmax_masked_keys_zero_out_of_regime(rng):
    """Masked keys must receive exactly zero weight even when a row is far
    outside the offset bound's validity regime (where the -80 exp floor
    would otherwise hand every key — including padded garbage — the same
    e^-80 weight). With the keys zeroed, the out-of-regime degradation
    falls back to near-uniform attention over VALID keys only: the output
    must lie in the convex hull of the valid rows' v vectors."""
    b, n, c, n_valid = 1, 256, 32, 160
    src = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    tgt = src + jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 0.05
    mask = jnp.asarray((np.arange(n) < n_valid)[None])
    compat = spatial_consistency(src, tgt, 0.1, mask=mask)
    v = np.zeros((b, n, c), np.float32)
    v[:, :n_valid] = rng.normal(size=(b, n_valid, c))
    v[:, n_valid:] = 1e6  # padded-garbage values: must never leak through
    v = jnp.asarray(v)
    q = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)) * 30.0
    k = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)) * 30.0
    out = np.asarray(fused_sc_attention_cached(
        q, k, v, compat, src, tgt, mask=mask, block_q=128, block_k=128,
        interpret=True,
    ))
    assert np.isfinite(out).all()
    vmax = float(np.abs(np.asarray(v)[0, :n_valid]).max())
    assert np.abs(out[0, :n_valid]).max() <= vmax + 1e-3, (
        "masked-key values leaked into out-of-regime rows"
    )


def test_cached_model_forward_matches_dense(rng):
    model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=16, ratio=0.1)
    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=256, inlier_ratio=0.6)
    batch = lambda a: jnp.asarray(a)[None]
    variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))
    out_dense = model.apply(variables, batch(cp), batch(src), batch(tgt), testing=True)
    out_cached = model.apply(
        variables, batch(cp), batch(src), batch(tgt),
        testing=True, fused_attention=True,
    )
    # cached path uses a bf16 compat cache -> small softmax perturbations;
    # the recovered transform must agree
    np.testing.assert_allclose(
        np.asarray(out_cached.final_trans), np.asarray(out_dense.final_trans),
        atol=5e-3,
    )


class TestCompatCacheBuilder:
    def test_matches_jnp_quantization(self, rng):
        from pointdsc_tpu.kernels.sc_attention import build_compat_cache_int8
        from pointdsc_tpu.ops.compatibility import spatial_consistency

        src = jnp.asarray(rng.uniform(-2, 2, (1, 384, 3)).astype(np.float32))
        tgt = src + jnp.asarray(
            rng.normal(size=(1, 384, 3)).astype(np.float32) * 0.05
        )
        kern = np.asarray(
            build_compat_cache_int8(src, tgt, 0.10, interpret=True)
        ).astype(np.int32)
        ref = np.asarray(
            jnp.round(spatial_consistency(src, tgt, 0.10) * 127).astype(
                jnp.int8
            )
        ).astype(np.int32)
        # gram-form one-sqrt distances (s2 + t2 - 2*sqrt(s2*t2)) vs the
        # jnp exact-difference path: at most one quantization level apart,
        # on a small fraction of entries (~0.5%); the downstream softmax is
        # insensitive to the full 1/255 quantization, let alone one quantum
        # on a sliver of entries (quality-equivalence runs in STATUS.md)
        diff = np.abs(kern - ref)
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-2

    def test_symmetric_path_matches_full_grid(self, rng):
        """Square caches with N % 1024 == 0 take the triangular+mirror
        path; it must be BITWISE identical to the full-grid builder (the
        gram-form tile math commutes entrywise, so mirrored bytes equal
        computed ones exactly)."""
        from pointdsc_tpu.kernels.sc_attention import (
            _build_compat_cache_single,
            _build_compat_cache_symmetric,
            build_compat_cache_int8,
            pack_geometry,
        )

        n = 2048
        src = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
        tgt = src + jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 0.05
        )
        geom = pack_geometry(src, tgt, None)
        full = np.asarray(
            _build_compat_cache_single(geom, 0.10, interpret=True)
        )
        sym = np.asarray(
            _build_compat_cache_symmetric(geom, 0.10, interpret=True)
        )
        np.testing.assert_array_equal(sym, full)
        # and through the batched public entry point (vmap over the pair
        # axis wraps the aliased mirror pass too)
        batched = np.asarray(
            build_compat_cache_int8(
                src[None], tgt[None], 0.10, interpret=True
            )
        )
        np.testing.assert_array_equal(batched[0], full)
