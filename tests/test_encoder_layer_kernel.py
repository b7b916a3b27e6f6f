"""Fused whole-encoder-layer kernel equivalence (kernels/encoder_layer.py).

The fused-layer path (PointCN + QKV + cached attention + message MLP +
residual in one Pallas call, BN folded) must match the per-op encoder at
eval on identical weights, masked and unmasked; and the flax parameter
tree must be byte-identical between the computing modules and the holder
modules so checkpoints are oblivious to which path runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointdsc_tpu.kernels.encoder_layer import make_fused_layer_fn
from pointdsc_tpu.kernels.sc_attention import (
    build_compat_cache_int8,
    make_sc_attention_fn,
)
from pointdsc_tpu.models.blocks import NonLocalNet


def setup(rng, n=256, c=64, layers=2, in_dim=6):
    enc = NonLocalNet(in_dim=in_dim, num_layers=layers, num_channels=c)
    corr = jnp.asarray(rng.normal(size=(1, n, in_dim)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
    variables = enc.init(jax.random.key(0), corr, None,
                         attention_fn=lambda q, k, v, m: v)
    # randomize BN affine/stats so folding is actually exercised
    def jitter(tree, scale):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(jax.random.key(7), len(leaves))
        return treedef.unflatten([
            l + scale * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ])

    variables = {
        "params": jitter(variables["params"], 0.05),
        "batch_stats": jax.tree_util.tree_map(
            lambda v: v + 0.3 * jnp.abs(v) + 0.1, variables["batch_stats"]
        ),
    }
    return enc, variables, corr, src, tgt


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("split", [False, True])
def test_fused_layer_matches_per_op_path(rng, masked, split, monkeypatch):
    n = 256
    if split:
        # force the large-N two-kernel path (PointCN+QKV pass, then
        # attention+MLP+residual pass) at a testable size
        import pointdsc_tpu.kernels.encoder_layer as el

        monkeypatch.setattr(el, "MAX_FUSED_LAYER_N", 0)
    enc, variables, corr, src, tgt = setup(rng, n=n)
    mask = None
    if masked:
        m = np.ones((1, n), bool)
        m[:, n - 40:] = False
        mask = jnp.asarray(m)

    cache = build_compat_cache_int8(src, tgt, 0.10, mask=mask)
    attn = make_sc_attention_fn(src, tgt, 0.10, mask=mask,
                                compat_cache=cache, interpret=True)
    ref = enc.apply(variables, corr, None, mask=mask, attention_fn=attn)

    layer_fn = make_fused_layer_fn(cache, mask=mask, interpret=True)
    got = enc.apply(variables, corr, None, mask=mask,
                    fused_layer_fn=layer_fn)

    ra = np.asarray(ref)
    ga = np.asarray(got)
    if masked:
        ra, ga = ra[:, : n - 40], ga[:, : n - 40]
    # both paths stream q/k/v in bf16; agreement is to bf16 resolution of
    # the activations
    scale = np.abs(ra).max()
    np.testing.assert_allclose(ga, ra, atol=2e-2 * scale, rtol=0)
    assert np.median(np.abs(ga - ra)) < 2e-3 * scale


def test_param_tree_identical_between_paths(rng):
    """init through the fused-layer holders must produce the exact
    variable tree of the computing modules."""
    enc, variables, corr, src, tgt = setup(rng)
    cache = build_compat_cache_int8(src, tgt, 0.10)
    layer_fn = make_fused_layer_fn(cache, interpret=True)
    v2 = enc.init(jax.random.key(0), corr, None, fused_layer_fn=layer_fn)

    paths1 = {jax.tree_util.keystr(k): v.shape
              for k, v in jax.tree_util.tree_leaves_with_path(variables)}
    paths2 = {jax.tree_util.keystr(k): v.shape
              for k, v in jax.tree_util.tree_leaves_with_path(v2)}
    assert paths1 == paths2


def test_full_model_fused_layer_consistency(rng):
    """Whole-pipeline check: the testing-mode forward with the fused-layer
    path produces the same transform as the per-op fused path (CPU
    interpret mode, small N so the gate activates)."""
    from pointdsc_tpu.models import PointDSC
    from tests.test_model import make_synthetic_pair

    model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2)
    cp, src, tgt, gt, lab = make_synthetic_pair(rng, n=256, inlier_ratio=0.5)
    batch = lambda a: jnp.asarray(a)[None]
    variables = model.init(jax.random.key(0), batch(cp), batch(src), batch(tgt))

    out = model.apply(variables, batch(cp), batch(src), batch(tgt),
                      testing=True, fused_attention=True)
    # the per-op path, forced by disabling the cache (recompute kernel)
    out_ref = model.apply(variables, batch(cp), batch(src), batch(tgt),
                          testing=True, fused_attention=False)
    # both must recover the planted transform
    np.testing.assert_allclose(
        np.asarray(out.final_trans), np.asarray(out_ref.final_trans),
        atol=5e-2,
    )
