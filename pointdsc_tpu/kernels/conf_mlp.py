"""Fused confidence-head MLP (Pallas TPU).

The classification head (reference PointDSC.py:101-106: Conv1d 128->32->32->1
with ReLUs) is three skinny matmuls whose 32-wide intermediates tile poorly
(32 of 128 lanes) and round-trip HBM between ops. This kernel runs the whole
head per feature tile in VMEM: weights are zero-padded to [128, 128] so the
dead lanes compute exact zeros (zero weights, zero biases, relu(0) = 0) and
the three matmuls stay full MXU passes. Only the [N] logits leave.

Eval-path only (gated with the other fused kernels); training uses the
flax Dense modules so gradients flow normally. Identical math: f32
matmuls, zero-padded lanes contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pad_weights(params):
    """flax params {classification_0/1/2: {kernel, bias}} -> padded arrays."""

    def pad_k(k):
        out = jnp.zeros((128, 128), jnp.float32)
        return out.at[: k.shape[0], : k.shape[1]].set(k.astype(jnp.float32))

    def pad_b(b):
        out = jnp.zeros((128,), jnp.float32)
        return out.at[: b.shape[0]].set(b.astype(jnp.float32))

    w = [pad_k(params[f"classification_{i}"]["kernel"]) for i in range(3)]
    b = jnp.stack(
        [pad_b(params[f"classification_{i}"]["bias"]) for i in range(3)]
        + [jnp.zeros((128,), jnp.float32)] * 5
    )  # [8, 128]
    return w[0], w[1], w[2], b


def _conf_kernel(x_ref, w1_ref, w2_ref, w3_ref, b_ref, out_ref):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    h = jnp.maximum(h + b_ref[0:1, :], 0.0)
    h = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    h = jnp.maximum(h + b_ref[1:2, :], 0.0)
    h = jax.lax.dot_general(
        h, w3_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    out_ref[:] = h + b_ref[2:3, :]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _conf_single(x, w1, w2, w3, b, block=1024, interpret=False):
    n, c = x.shape
    assert c == 128, "confidence head kernel assumes 128 input channels"
    bn = min(block, n)
    while n % bn != 0:
        bn //= 2
    out = pl.pallas_call(
        _conf_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, c), lambda i: (i, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        interpret=interpret,
    )(x, w1, w2, w3, b)
    return out[:, 0]


def confidence_head(features, params, interpret=None):
    """Fused classification head: [B, N, 128] features -> [B, N] logits.

    params: the model's flax param subtree containing classification_{0,1,2}.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w1, w2, w3, b = _pad_weights(params)
    return jax.vmap(lambda x: _conf_single(x, w1, w2, w3, b,
                                           interpret=interpret))(features)
