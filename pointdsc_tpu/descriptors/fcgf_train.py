"""VoxelFCGF training: hardest-contrastive metric learning.

The reference ships FCGF weights trained upstream (the FCGF paper's
hardest-contrastive loss); the mount has no checkpoint (git-LFS absent), so
descriptor parity is re-trained. This module provides the loss and a jitted
train step over pairs of augmented views:

    L = mean_pos  max(0, ||f0_i - f1_i|| - m_pos)^2
      + 0.5 * mean (max(0, m_neg - hardest_neg_dist))^2

with hardest negatives mined within the batch (excluding the true match and
spatial neighbors of it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax


def hardest_contrastive_loss(
    f0: jnp.ndarray,  # [N, C] anchor descriptors (matched pairs with f1)
    f1: jnp.ndarray,  # [N, C]
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    mask: jnp.ndarray | None = None,
):
    """FCGF-style hardest-contrastive loss over matched descriptor pairs."""
    n = f0.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    m = mask.astype(f0.dtype)

    pos_d = jnp.sqrt(jnp.sum((f0 - f1) ** 2, axis=-1) + 1e-12)
    pos_loss = jnp.sum(jnp.maximum(pos_d - pos_margin, 0.0) ** 2 * m) / jnp.maximum(
        jnp.sum(m), 1.0
    )

    # hardest in-batch negatives (exclude the diagonal = the true match)
    d01 = jnp.sqrt(
        jnp.maximum(
            jnp.sum(f0 * f0, -1)[:, None]
            + jnp.sum(f1 * f1, -1)[None, :]
            - 2.0 * f0 @ f1.T,
            0.0,
        )
        + 1e-12
    )
    eye = jnp.eye(n, dtype=bool)
    big = jnp.asarray(1e6, f0.dtype)
    d01 = jnp.where(eye | ~mask[None, :], big, d01)
    hardest0 = jnp.min(d01, axis=1)
    hardest1 = jnp.min(d01, axis=0)
    neg_loss0 = jnp.sum(jnp.maximum(neg_margin - hardest0, 0.0) ** 2 * m) / jnp.maximum(
        jnp.sum(m), 1.0
    )
    neg_loss1 = jnp.sum(jnp.maximum(neg_margin - hardest1, 0.0) ** 2 * m) / jnp.maximum(
        jnp.sum(m), 1.0
    )
    return pos_loss + 0.5 * (neg_loss0 + neg_loss1), {
        "pos_loss": pos_loss,
        "neg_loss": 0.5 * (neg_loss0 + neg_loss1),
        "pos_dist": jnp.sum(pos_d * m) / jnp.maximum(jnp.sum(m), 1.0),
        "neg_dist": jnp.sum(hardest0 * m) / jnp.maximum(jnp.sum(m), 1.0),
    }


def make_fcgf_train_step(model, tx: optax.GradientTransformation):
    """Returns a jitted step over paired occupancy grids + matched voxel
    indices: (params, opt_state, batch_stats, occ0, occ1, idx0, idx1, mask)."""

    @jax.jit
    def step(params, opt_state, batch_stats, occ0, occ1, idx0, idx1, mask):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": batch_stats}
            g0, upd = model.apply(variables, occ0, train=True, mutable=["batch_stats"])
            g1, upd = model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]},
                occ1, train=True, mutable=["batch_stats"],
            )
            f0 = g0[0][idx0[:, 0], idx0[:, 1], idx0[:, 2]]
            f1 = g1[0][idx1[:, 0], idx1[:, 1], idx1[:, 2]]
            loss, metrics = hardest_contrastive_loss(f0, f1, mask=mask)
            return loss, (upd["batch_stats"], metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return new_params, new_opt, new_stats, metrics

    return step
