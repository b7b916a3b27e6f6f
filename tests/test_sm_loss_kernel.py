"""Fused SM-loss kernel equivalence vs the dense chain.

The fused kernel (kernels/sm_loss.py) must reproduce, to float tolerance,
the loss AND the gradients (d normed_features, d sigma) of the dense
feature_similarity -> spectral_matching_loss composition, for balanced and
unbalanced variants, with and without padding masks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointdsc_tpu.kernels.sm_loss import fused_spectral_matching_loss
from pointdsc_tpu.ops.compatibility import feature_similarity
from pointdsc_tpu.train.losses import spectral_matching_loss


def dense_loss(f, sigma, gt, mask, balanced):
    M = feature_similarity(f, sigma, mask=mask)
    return spectral_matching_loss(M, gt, mask, balanced=balanced)


def make_inputs(rng, b=2, n=256, c=32, pad=0):
    f = rng.normal(size=(b, n, c)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    gt = (rng.random((b, n)) < 0.3).astype(np.float32)
    mask = np.ones((b, n), bool)
    if pad:
        mask[:, n - pad:] = False
        gt *= mask
    return jnp.asarray(f), jnp.asarray(gt), jnp.asarray(mask)


@pytest.mark.parametrize("balanced", [True, False])
@pytest.mark.parametrize("pad", [0, 57])
def test_loss_and_grads_match_dense(rng, balanced, pad):
    f, gt, mask = make_inputs(rng, pad=pad)
    sigma = jnp.asarray(1.07, jnp.float32)

    ref_loss, (ref_df, ref_ds) = jax.value_and_grad(
        lambda ff, ss: dense_loss(ff, ss, gt, mask, balanced), argnums=(0, 1)
    )(f, sigma)
    got_loss, (got_df, got_ds) = jax.value_and_grad(
        lambda ff, ss: fused_spectral_matching_loss(
            ff, ss, gt, mask, balanced, True
        ),
        argnums=(0, 1),
    )(f, sigma)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_df), np.asarray(ref_df), atol=1e-6,
        err_msg="dF diverged",
    )
    np.testing.assert_allclose(
        float(got_ds), float(ref_ds), rtol=1e-4, err_msg="dsigma diverged"
    )


def test_sigma_off_init_and_clamp_activity(rng):
    """sigma far from 1 drives many entries into the clamp's active regions;
    gradients must still agree (the gate logic)."""
    f, gt, mask = make_inputs(rng, b=1, n=256, c=16)
    for sigma_val in (0.4, 2.5):
        sigma = jnp.asarray(sigma_val, jnp.float32)
        ref_loss, (ref_df, ref_ds) = jax.value_and_grad(
            lambda ff, ss: dense_loss(ff, ss, gt, mask, True), argnums=(0, 1)
        )(f, sigma)
        got_loss, (got_df, got_ds) = jax.value_and_grad(
            lambda ff, ss: fused_spectral_matching_loss(
                ff, ss, gt, mask, True, True
            ),
            argnums=(0, 1),
        )(f, sigma)
        np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_df), np.asarray(ref_df), atol=1e-6
        )
        np.testing.assert_allclose(float(got_ds), float(ref_ds), rtol=1e-4)


def test_multi_tile_grid(rng):
    """N larger than one tile exercises the grid accumulation paths."""
    f, gt, mask = make_inputs(rng, b=1, n=2048, c=32, pad=100)
    sigma = jnp.asarray(1.1, jnp.float32)
    ref = float(dense_loss(f, sigma, gt, mask, True))
    got = float(fused_spectral_matching_loss(f, sigma, gt, mask, True, True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("n", [1000, 640])
def test_non_power_of_two_n(rng, n):
    """N=1000 (the reference 3DMatch num_node) has no Mosaic-legal tiling —
    the public entry must route it through the dense fallback rather than
    emit 8-wide lane blocks; N=640 = 5*128 must stay on the kernel path.
    Both must match the dense chain in loss and grads."""
    from pointdsc_tpu.kernels.sm_loss import _pick_blocks

    assert _pick_blocks(1000) is None
    assert _pick_blocks(640) == (128, 128)
    assert _pick_blocks(12288) == (512, 512)
    assert _pick_blocks(256) == (256, 256)

    f, gt, mask = make_inputs(rng, n=n, pad=13)
    sigma = jnp.asarray(1.07, jnp.float32)
    ref_loss, (ref_df, ref_ds) = jax.value_and_grad(
        lambda ff, ss: dense_loss(ff, ss, gt, mask, True), argnums=(0, 1)
    )(f, sigma)
    got_loss, (got_df, got_ds) = jax.value_and_grad(
        lambda ff, ss: fused_spectral_matching_loss(ff, ss, gt, mask, True,
                                                    True),
        argnums=(0, 1),
    )(f, sigma)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_df), np.asarray(ref_df),
                               atol=1e-6)
    np.testing.assert_allclose(float(got_ds), float(ref_ds), rtol=1e-4)
