"""Data pipeline: correspondence construction, bucketing, loader."""

import numpy as np

from pointdsc_tpu.data import (
    SyntheticPairDataset,
    Loader,
    build_correspondences,
    bucket_size,
    collate_batch,
    pad_to_bucket,
)
from pointdsc_tpu.data import transforms_np as T


class TestBuildCorrespondences:
    def test_ground_truth_labels(self, rng):
        n = 200
        src = rng.uniform(-1, 1, (n, 3))
        R = T.rotation_matrix(3, 1.0, rng)
        t = T.translation_matrix(0.5, rng)
        gt = T.integrate_trans(R, t)
        tgt = T.transform(src, gt)
        # descriptors: identical latent for matched points
        desc = rng.normal(size=(n, 32))
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        sample = build_correspondences(
            src, tgt, desc, desc, gt, inlier_threshold=0.10,
            num_node="all", use_mutual=True, rng=rng,
        )
        assert sample["gt_labels"].mean() > 0.99
        assert sample["corr_pos"].shape == (n, 6)
        # in_dim=6 input is centered
        np.testing.assert_allclose(sample["corr_pos"].mean(0), 0.0, atol=1e-5)

    def test_num_node_sampling(self, rng):
        src = rng.uniform(-1, 1, (500, 3))
        desc = rng.normal(size=(500, 16))
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        sample = build_correspondences(
            src, src, desc, desc, np.eye(4), 0.1, num_node=128, rng=rng
        )
        assert sample["corr_pos"].shape[0] == 128


class TestBucketing:
    def test_bucket_size(self):
        assert bucket_size(100) == 256
        assert bucket_size(256) == 256
        assert bucket_size(257) == 512
        assert bucket_size(5000) == 5120
        assert bucket_size(30000) % 2048 == 0

    def test_pad_and_collate(self, rng):
        ds = SyntheticPairDataset(num_pairs=4, num_corr=300, vary_n=True, seed=1)
        batch = collate_batch([ds[i] for i in range(4)])
        n_pad = batch["corr_pos"].shape[1]
        assert n_pad == bucket_size(300)
        assert batch["mask"].shape == (4, n_pad)
        for i in range(4):
            n_i = int(batch["mask"][i].sum())
            assert (batch["corr_pos"][i, n_i:] == 0).all()


class TestLoader:
    def test_iterates_all_batches(self):
        ds = SyntheticPairDataset(num_pairs=10, num_corr=128)
        loader = Loader(ds, batch_size=4, shuffle=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == len(loader) == 2
        for b in batches:
            assert b["corr_pos"].shape[0] == 4
            assert set(b.keys()) == {
                "corr_pos", "src_keypts", "tgt_keypts", "gt_trans",
                "gt_labels", "mask",
            }

    def test_deterministic_with_seed(self):
        ds = SyntheticPairDataset(num_pairs=8, num_corr=64)
        l1 = list(Loader(ds, 4, shuffle=True, seed=7))
        l2 = list(Loader(ds, 4, shuffle=True, seed=7))
        np.testing.assert_array_equal(l1[0]["corr_pos"], l2[0]["corr_pos"])
