"""Fused hypothesis-scoring kernel (kernels/scoring.py) vs the jnp
reference counting, interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp

from pointdsc_tpu.kernels.scoring import seed_inlier_counts
from pointdsc_tpu.models.pointdsc import PointDSC


def _ref_counts(trans, src, tgt, thr, mask):
    pred = np.einsum("bsij,bnj->bsni", trans[:, :, :3, :3], src) + trans[
        :, :, None, :3, 3
    ]
    d = np.linalg.norm(pred - tgt[:, None], axis=-1)
    return ((d < thr) & mask[:, None, :]).sum(-1)


class TestSeedInlierCounts:
    def test_matches_reference_counts(self, rng):
        B, S, N = 2, 48, 640
        trans = np.tile(np.eye(4, dtype=np.float32), (B, S, 1, 1))
        trans[..., :3, 3] = rng.normal(size=(B, S, 3)).astype(np.float32)
        src = rng.normal(size=(B, N, 3)).astype(np.float32)
        tgt = rng.normal(size=(B, N, 3)).astype(np.float32)
        mask = rng.uniform(size=(B, N)) > 0.25
        counts = np.asarray(
            seed_inlier_counts(
                jnp.asarray(trans), jnp.asarray(src), jnp.asarray(tgt),
                0.8, jnp.asarray(mask), interpret=True,
            )
        )
        np.testing.assert_array_equal(
            counts.astype(int), _ref_counts(trans, src, tgt, 0.8, mask)
        )

    def test_model_fused_selection_matches_dense(self, rng):
        """Through the model: fused scoring must pick the same best seed and
        produce the same labels as the dense einsum path."""
        from pointdsc_tpu.data.synthetic import SyntheticPairDataset

        model = PointDSC(
            in_dim=6, num_layers=2, num_channels=32, k=12, ratio=0.2,
            refine_iters=0,
        )
        ds = SyntheticPairDataset(num_pairs=1, num_corr=256, inlier_ratio=0.5,
                                  seed=4)
        s = ds[0]
        args = tuple(jnp.asarray(s[k])[None] for k in
                     ("corr_pos", "src_keypts", "tgt_keypts"))
        variables = model.init(jax.random.key(0), *args)
        dense = model.apply(variables, *args, testing=True,
                            fused_attention=False)
        fused = model.apply(variables, *args, testing=True,
                            fused_attention=True)
        # attention kernels differ at bf16 level; near-tied confidences can
        # reorder NMS seeds between the paths (an untrained random-init
        # model has many ties), so compare the fitness MULTISET, the
        # winning transform, and the labels — not elementwise seed order
        np.testing.assert_allclose(
            np.sort(np.asarray(fused.seed_fitness), axis=-1),
            np.sort(np.asarray(dense.seed_fitness), axis=-1),
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(fused.final_trans), np.asarray(dense.final_trans),
            atol=1e-4,
        )
        agree = (
            np.asarray(fused.final_labels) == np.asarray(dense.final_labels)
        ).mean()
        assert agree > 0.97


class TestFusedConfidenceHead:
    def test_kernel_matches_dense_math(self, rng):
        from pointdsc_tpu.kernels.conf_mlp import confidence_head

        feats = jnp.asarray(rng.normal(size=(2, 384, 128)).astype(np.float32))
        params = {}
        raw = {}
        cin = 128
        for i, cout in enumerate((32, 32, 1)):
            k = (rng.normal(size=(cin, cout)) * 0.1).astype(np.float32)
            b = (rng.normal(size=cout) * 0.1).astype(np.float32)
            params[f"classification_{i}"] = {
                "kernel": jnp.asarray(k), "bias": jnp.asarray(b)
            }
            raw[i] = (k, b)
            cin = cout
        out = np.asarray(confidence_head(feats, params, interpret=True))
        x = np.asarray(feats)
        for i in range(2):
            x = np.maximum(x @ raw[i][0] + raw[i][1], 0.0)
        ref = (x @ raw[2][0] + raw[2][1])[..., 0]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_model_128ch_fused_uses_kernel(self, rng):
        """A 128-channel model (the only config that takes the kernel path)
        must produce the same confidences fused as dense."""
        from pointdsc_tpu.data.synthetic import SyntheticPairDataset

        model = PointDSC(
            in_dim=6, num_layers=1, num_channels=128, k=12, ratio=0.2,
            refine_iters=0,
        )
        ds = SyntheticPairDataset(num_pairs=1, num_corr=256, inlier_ratio=0.5,
                                  seed=9)
        s = ds[0]
        args = tuple(jnp.asarray(s[k])[None] for k in
                     ("corr_pos", "src_keypts", "tgt_keypts"))
        variables = model.init(jax.random.key(1), *args)
        dense = model.apply(variables, *args, testing=True,
                            fused_attention=False)
        fused = model.apply(variables, *args, testing=True,
                            fused_attention=True)
        # identical features would give identical logits; the bf16 attention
        # kernel perturbs features slightly, so compare with a tolerance
        np.testing.assert_allclose(
            np.asarray(fused.confidence), np.asarray(dense.confidence),
            atol=5e-2,
        )
