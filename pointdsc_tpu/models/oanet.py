"""Order-Aware Net variant (ablation architecture).

Rebuilds /root/reference/models/OANet.py:7-180 in channels-last flax:
differentiable pooling to a small cluster set (soft assignments), OAFilters
with a Spatial Correlation Layer over the cluster axis, unpooling, and an
inlier-logit head. The reference's forward returns features early (dead code
after OANet.py:156); here the full path through the logit head and a
Procrustes fit is wired, giving a usable alternative end-to-end model:
    logits -> weights = relu(tanh(logits)) -> weighted Procrustes.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from pointdsc_tpu.models.blocks import ContextNorm, MaskedBatchNorm
from pointdsc_tpu.ops.procrustes import weighted_procrustes


class DiffPool(nn.Module):
    """Soft-pool N correspondences into `num_clusters` slots
    (OANet.py:7-21): S = softmax over N of a learned embedding; out = x^T S."""

    num_clusters: int = 10

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # x: [B, N, C] -> [B, num_clusters, C]
        h = ContextNorm()(x, mask=mask)
        h = MaskedBatchNorm()(h, mask=mask, train=train)
        h = nn.relu(h)
        embed = nn.Dense(self.num_clusters)(h)  # [B, N, K]
        if mask is not None:
            embed = jnp.where(mask[..., None], embed, -1e9)
        S = nn.softmax(embed, axis=-2)  # normalize over correspondences
        return jnp.einsum("bnk,bnc->bkc", S, x)


class DiffUnpool(nn.Module):
    """Distribute cluster features back to correspondences (OANet.py:23-39):
    S = softmax over clusters; out = S x_down."""

    num_clusters: int = 10

    @nn.compact
    def __call__(self, x_up, x_down, mask=None, train: bool = False):
        # x_up: [B, N, C]; x_down: [B, K, C] -> [B, N, C]
        h = ContextNorm()(x_up, mask=mask)
        h = MaskedBatchNorm()(h, mask=mask, train=train)
        h = nn.relu(h)
        embed = nn.Dense(self.num_clusters)(h)  # [B, N, K]
        S = nn.softmax(embed, axis=-1)  # normalize over clusters
        return jnp.einsum("bnk,bkc->bnc", S, x_down)


class OAFilter(nn.Module):
    """Order-aware filter block over the cluster axis (OANet.py:51-87):
    channel MLP -> Spatial Correlation Layer (mixing the K cluster slots)
    -> channel MLP, residual."""

    num_channels: int
    num_clusters: int
    out_channels: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, K, C] (cluster axis plays the "points" role)
        out_c = self.out_channels or self.num_channels
        h = ContextNorm()(x)
        h = MaskedBatchNorm()(h, train=train)
        h = nn.relu(h)
        h = nn.Dense(out_c)(h)  # [B, K, out_c]

        # Spatial Correlation Layer: a Dense across the cluster axis
        s = jnp.swapaxes(h, -1, -2)  # [B, out_c, K]
        s = MaskedBatchNorm()(s, train=train)
        s = nn.relu(s)
        s = nn.Dense(self.num_clusters)(s)
        h = h + jnp.swapaxes(s, -1, -2)

        h2 = ContextNorm()(h)
        h2 = MaskedBatchNorm()(h2, train=train)
        h2 = nn.relu(h2)
        h2 = nn.Dense(out_c)(h2)

        shortcut = x if out_c == self.num_channels else nn.Dense(out_c)(x)
        return h2 + shortcut


class PointCNStack(nn.Module):
    """Conv1d + CN + BN + ReLU stack (reference PointCN, common.py:118-139)."""

    num_channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = nn.Dense(self.num_channels)(x)
        for _ in range(self.num_layers):
            x = nn.Dense(self.num_channels)(x)
            # reference ContextNormalization uses torch.var -> unbiased
            x = ContextNorm(unbiased=True)(x, mask=mask)
            x = MaskedBatchNorm()(x, mask=mask, train=train)
            x = nn.relu(x)
        return x


class OANet(nn.Module):
    in_dim: int = 6
    num_layers: int = 6
    num_channels: int = 128
    num_clusters: int = 10

    @nn.compact
    def __call__(
        self,
        corr_pos,
        src_keypts,
        tgt_keypts,
        mask=None,
        testing: bool = False,
        train: bool = False,
    ):
        b, n, _ = corr_pos.shape
        if mask is None:
            mask = jnp.ones((b, n), dtype=bool)

        x1 = PointCNStack(self.num_channels, self.num_layers // 2, name="l1_1")(
            corr_pos, mask=mask, train=train
        )
        x_down = DiffPool(self.num_clusters, name="down1")(x1, mask=mask, train=train)
        x2 = x_down
        for i in range(self.num_layers // 2):
            x2 = OAFilter(
                self.num_channels, self.num_clusters, name=f"oa_{i}"
            )(x2, train=train)
        x_up = DiffUnpool(self.num_clusters, name="up1")(x1, x2, mask=mask, train=train)

        feats = jnp.concatenate([x1, x_up], axis=-1)
        out = PointCNStack(self.num_channels, self.num_layers // 2 - 1, name="l1_2")(
            feats, mask=mask, train=train
        )
        logits = nn.Dense(1, name="output")(out)[..., 0]
        logits = jnp.where(mask, logits, -1e9)

        weights = nn.relu(jnp.tanh(logits)) * mask
        trans = weighted_procrustes(src_keypts, tgt_keypts, weights)
        return {"final_trans": trans, "final_labels": logits, "M": None}
