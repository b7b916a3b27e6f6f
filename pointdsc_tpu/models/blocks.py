"""Shared network blocks (flax.linen, channels-last).

TPU layout note: everything is [batch, num_corr, channels] (channels last) so
the 1x1 "convolutions" of the reference become Dense matmuls whose contraction
axis (128 channels) lands exactly on the MXU lanes. The reference layout is
[batch, channels, num_corr] with Conv1d(k=1); the two are mathematically
identical (/root/reference/models/common.py:106-139, models/PointDSC.py:9-77).

BatchNorm over the correspondence axis is replicated with *masked* statistics
so padded correspondences do not pollute the mean/var (the reference instead
clips batches to the minimum correspondence count, datasets/dataloader.py:6-31).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import flax.linen as nn

_NEG_INF = -1e9


def _acc_dtype(dtype):
    """Accumulation/statistics dtype: f32 for f32/bf16 inputs, f64 under
    x64 (keeps the model exactly dtype-preserving for the float64
    cross-implementation parity tests)."""
    return jnp.promote_types(dtype, jnp.float32)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d equivalent: per-channel stats over (batch, num_corr).

    Matches torch.nn.BatchNorm1d semantics (momentum 0.1, eps 1e-5, affine)
    with the addition of a validity mask; running stats live in the
    `batch_stats` collection.
    """

    momentum: float = 0.9  # running = momentum * running + (1 - momentum) * new
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # x: [B, N, C]; mask: [B, N] or None
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), self.dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), self.dtype)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.dtype)

        # statistics always accumulate in the promoted (f32/f64) dtype; the
        # normalized output is returned in x's own dtype so bf16 activation
        # chains stay bf16 through Dense -> BN -> ReLU (HBM traffic halves)
        acc = _acc_dtype(x.dtype)
        xs = x.astype(acc)
        if train:
            if mask is None:
                mean = jnp.mean(xs, axis=(0, 1))
                var = jnp.mean((xs - mean) ** 2, axis=(0, 1))
            else:
                m = mask[..., None].astype(acc)
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xs * m, axis=(0, 1)) / count
                var = jnp.sum(((xs - mean) ** 2) * m, axis=(0, 1)) / count
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value.astype(acc), ra_var.value.astype(acc)

        # y = x * a + b (a, b computed in acc dtype, applied in x.dtype --
        # XLA folds the per-channel scale/shift into the producing matmul)
        a = scale.astype(acc) / jnp.sqrt(var + self.epsilon)
        b = bias.astype(acc) - mean * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class EdgeConv(nn.Module):
    """DGCNN-style edge convolution over feature-space k-NN graphs
    (/root/reference/models/common.py:72-103; present for parity -- the
    reference's final model does not use it either).

    For each point: features of its k nearest neighbors are concatenated as
    [x_j - x_i, x_i], passed through a Dense, max-pooled over neighbors.
    """

    out_dim: int
    k: int = 10

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [B, N, C]
        from pointdsc_tpu.ops.knn import feature_knn

        b, n, c = x.shape
        idx = feature_knn(x, k=self.k, normalized=False, mask=mask)  # [B, N, k]
        neigh = jax_take_neighbors(x, idx)
        center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
        feats = jnp.concatenate([neigh - center, center], axis=-1)
        h = nn.Dense(self.out_dim, use_bias=False)(feats)  # [B, N, k, out]
        return jnp.max(h, axis=2)


def jax_take_neighbors(x, idx):
    """Gather neighbor features: x [B, N, C], idx [B, N, k] -> [B, N, k, C]."""
    b, n, c = x.shape
    k = idx.shape[-1]
    flat = idx.reshape(b, n * k)
    out = jnp.take_along_axis(x, flat[..., None], axis=1)
    return out.reshape(b, n, k, c)


class ContextNorm(nn.Module):
    """Per-set (instance) normalization over the correspondence axis.
    Parameter-free.

    Two reference variance conventions exist: ``ContextNormalization``
    (/root/reference/models/common.py:106-115) uses ``torch.var`` which is
    UNBIASED (N-1 denominator), while the ``InstanceNorm1d(eps=1e-3)``
    layers inside the OANet pool/filter blocks (OANet.py:12,28,60,74) are
    biased (N denominator). `unbiased` selects between them; parity tests
    cover both.
    """

    epsilon: float = 1e-3
    unbiased: bool = False

    def __call__(self, x, mask=None):
        if mask is None:
            count = jnp.asarray(x.shape[-2], x.dtype)
            mean = jnp.mean(x, axis=-2, keepdims=True)
            var = jnp.var(x, axis=-2, keepdims=True)
        else:
            m = mask[..., None].astype(x.dtype)
            count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
            mean = jnp.sum(x * m, axis=-2, keepdims=True) / count
            var = jnp.sum(((x - mean) ** 2) * m, axis=-2, keepdims=True) / count
        if self.unbiased:
            var = var * (count / jnp.maximum(count - 1.0, 1.0))
        return (x - mean) / jnp.sqrt(var + self.epsilon)


class PointCNLayer(nn.Module):
    """Dense + BatchNorm + ReLU (one PointCN step, PointDSC.py:56-61).

    `compute_dtype=bfloat16` runs the Dense matmul on the MXU's fast path;
    normalization statistics stay f32 (flax keeps params f32 either way).
    """

    num_channels: int = 128
    compute_dtype: Any = None  # None = promote naturally (f32 or f64)

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = nn.Dense(
            self.num_channels,
            kernel_init=nn.initializers.xavier_normal(),
            dtype=self.compute_dtype,
        )(x)
        x = MaskedBatchNorm()(x, mask=mask, train=train)
        return nn.relu(x)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree layout ({kernel, bias})
    but no computation: lets sibling projections share one fused matmul
    while checkpoints/importers keep seeing separate projection_q/k/v
    Dense parameters."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        # dtype pinned: under jax_enable_x64 (the test suite's default for
        # LAPACK-parity assertions) a dtype-less initializer returns f64,
        # silently promoting every downstream matmul
        kernel = self.param(
            "kernel",
            nn.initializers.xavier_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class _BNParams(nn.Module):
    """Parameter/stats holder with MaskedBatchNorm's exact tree layout
    ({scale, bias} params + {mean, var} batch_stats) but no computation:
    the fused encoder-layer kernel folds eval-mode BN into the preceding
    Dense, so it needs the raw arrays while checkpoints keep the layout."""

    features: int

    @nn.compact
    def __call__(self):
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias, mean.value, var.value


class _PointCNParams(nn.Module):
    """PointCNLayer's parameter tree (Dense_0 + MaskedBatchNorm_0) as raw
    arrays for the fused encoder-layer kernel."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k, b = _DenseParams(self.in_features, self.features, name="Dense_0")()
        bn = _BNParams(self.features, name="MaskedBatchNorm_0")()
        return k, b, bn


class _NonLocalParams(nn.Module):
    """NonLocalBlock's parameter tree as raw arrays (same subtree names as
    the computing module: projection_q/k/v, fc_message_0..2, bn0/bn1)."""

    num_channels: int

    @nn.compact
    def __call__(self):
        c = self.num_channels
        kq, bq = _DenseParams(c, c, name="projection_q")()
        kk, bk = _DenseParams(c, c, name="projection_k")()
        kv, bv = _DenseParams(c, c, name="projection_v")()
        km0, bm0 = _DenseParams(c, c // 2, name="fc_message_0")()
        bn0 = _BNParams(c // 2, name="fc_message_bn0")()
        km1, bm1 = _DenseParams(c // 2, c // 2, name="fc_message_1")()
        bn1 = _BNParams(c // 2, name="fc_message_bn1")()
        km2, bm2 = _DenseParams(c // 2, c, name="fc_message_2")()
        return (kq, bq, kk, bk, kv, bv, km0, bm0, bn0, km1, bm1, bn1, km2, bm2)


class NonLocalBlock(nn.Module):
    """Spatial-consistency-modulated single-head attention block.

    Mirrors /root/reference/models/PointDSC.py:9-45: QKV projections, logits
    scaled by sqrt(C/heads) and *multiplied elementwise* by the spatial
    consistency matrix before softmax, message MLP (C -> C/2 -> C/2 -> C with
    BN+ReLU) and residual add.

    The `attention_fn` hook lets callers swap the materialized O(N^2)
    attention for the fused Pallas kernel at eval time.
    """

    num_channels: int = 128
    num_heads: int = 1
    attention_fn: Callable | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, feat, compat, mask=None, train: bool = False, attention_fn=None):
        # feat: [B, N, C]; compat: [B, N, N] or None when attention_fn
        # recomputes it on the fly.
        attention_fn = attention_fn or self.attention_fn
        c, h = self.num_channels, self.num_heads
        cdt = self.compute_dtype
        xavier = nn.initializers.xavier_normal()
        # one fused [C, 3C] matmul instead of three [C, C] dispatches; the
        # parameter tree is identical to three nn.Dense modules
        cin = feat.shape[-1]
        kq, bq = _DenseParams(cin, c, name="projection_q")()
        kk, bk = _DenseParams(cin, c, name="projection_k")()
        kv, bv = _DenseParams(cin, c, name="projection_v")()
        w_qkv = jnp.concatenate([kq, kk, kv], axis=-1)
        b_qkv = jnp.concatenate([bq, bk, bv], axis=-1)
        x_in = feat
        if cdt is not None:
            x_in, w_qkv, b_qkv = x_in.astype(cdt), w_qkv.astype(cdt), b_qkv.astype(cdt)
        qkv = x_in @ w_qkv + b_qkv
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]

        if attention_fn is not None:
            # kernels normalize dtypes themselves (bf16 streams, f32 accum);
            # casting here would force a redundant f32 round-trip on bf16
            # activation chains
            message = attention_fn(q, k, v, mask)
        else:
            b, n, _ = feat.shape
            qh = q.reshape(b, n, h, c // h)
            kh = k.reshape(b, n, h, c // h)
            vh = v.reshape(b, n, h, c // h)
            acc = _acc_dtype(qh.dtype)
            # O(N^2 C) contractions run in compute_dtype on the MXU with
            # f32 (f64 under x64) accumulation; softmax statistics likewise.
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=acc
            ) / jnp.sqrt(jnp.asarray(c // h, acc))
            scores = compat[:, None, :, :] * logits
            if mask is not None:
                scores = jnp.where(mask[:, None, None, :], scores, _NEG_INF)
            weight = nn.softmax(scores, axis=-1)
            message = jnp.einsum(
                "bhnm,bmhd->bnhd",
                weight.astype(vh.dtype),
                vh,
                preferred_element_type=acc,
            ).reshape(b, n, c)

        message = nn.Dense(c // 2, kernel_init=xavier, dtype=cdt,
                           name="fc_message_0")(message)
        message = MaskedBatchNorm(name="fc_message_bn0")(
            message, mask=mask, train=train
        )
        message = nn.relu(message)
        message = nn.Dense(c // 2, kernel_init=xavier, dtype=cdt,
                           name="fc_message_1")(message)
        message = MaskedBatchNorm(name="fc_message_bn1")(
            message, mask=mask, train=train
        )
        message = nn.relu(message)
        message = nn.Dense(c, kernel_init=xavier, dtype=cdt,
                           name="fc_message_2")(message)
        return feat + message.astype(feat.dtype)


class NonLocalNet(nn.Module):
    """Encoder: input lift + num_layers x (PointCN -> NonLocal) pairs
    (/root/reference/models/PointDSC.py:48-77). The spatial-consistency
    matrix is computed once by the caller and shared across layers."""

    in_dim: int = 6
    num_layers: int = 6
    num_channels: int = 128
    attention_fn: Callable | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self, corr_feat, compat, mask=None, train: bool = False,
        attention_fn=None, fused_layer_fn=None,
    ):
        # corr_feat: [B, N, in_dim]
        x = nn.Dense(
            self.num_channels,
            kernel_init=nn.initializers.xavier_normal(),
            name="layer0",
        )(corr_feat)
        if fused_layer_fn is not None:
            # eval fast path: each (PointCN + NonLocal) pair runs as ONE
            # Pallas kernel (kernels/encoder_layer.py). The holder modules
            # declare the identical parameter tree, so checkpoints and the
            # torch importer are oblivious to which path executes.
            for i in range(self.num_layers):
                pcn = _PointCNParams(
                    self.num_channels, self.num_channels,
                    name=f"PointCN_layer_{i}",
                )()
                nl = _NonLocalParams(
                    self.num_channels, name=f"NonLocal_layer_{i}"
                )()
                x = fused_layer_fn(x, pcn, nl)
            return x
        for i in range(self.num_layers):
            x = PointCNLayer(
                self.num_channels,
                compute_dtype=self.compute_dtype,
                name=f"PointCN_layer_{i}",
            )(x, mask=mask, train=train)
            x = NonLocalBlock(
                self.num_channels,
                attention_fn=self.attention_fn,
                compute_dtype=self.compute_dtype,
                name=f"NonLocal_layer_{i}",
            )(x, compat, mask=mask, train=train, attention_fn=attention_fn)
        return x
