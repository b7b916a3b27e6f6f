"""KITTI eval CLI end-to-end on a generated pair-file data root."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointdsc_tpu.data import transforms_np as T
from pointdsc_tpu.train.config import default_config
from pointdsc_tpu.train.trainer import Trainer


def write_fake_kitti(root, rng, num_pairs=3, n_pts=400):
    pair_dir = os.path.join(root, "fcgf_test")
    os.makedirs(pair_dir, exist_ok=True)
    for p in range(num_pairs):
        # LiDAR-scale scene
        xyz0 = rng.uniform(-20, 20, (n_pts, 3))
        desc = rng.normal(size=(n_pts, 32))
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        gt = T.integrate_trans(
            T.rotation_matrix(1, 0.02, rng), T.translation_matrix(8.0, rng)
        )
        xyz1 = T.transform(xyz0, gt) + rng.normal(size=(n_pts, 3)) * 0.05
        np.savez(
            os.path.join(pair_dir, f"pair_{p}.npz"),
            xyz0=xyz0.astype(np.float32),
            xyz1=xyz1.astype(np.float32),
            features0=desc.astype(np.float32),
            features1=desc.astype(np.float32),
            gt_trans=gt,
        )


@pytest.mark.slow
def test_kitti_cli_end_to_end(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "kitti")
    write_fake_kitti(root, rng)

    cfg = default_config("KITTI")
    cfg.num_layers = 2
    cfg.num_channels = 32
    cfg.k = 16
    cfg.ratio = 0.2
    cfg.root = root
    cfg.exp_id = "ktest"
    cfg.snapshot_dir = str(tmp_path / "snapshot" / "ktest")
    cfg.save_dir = os.path.join(cfg.snapshot_dir, "models")
    cfg.tboard_dir = ""
    cfg.verbose = False
    cfg.save(os.path.join(cfg.snapshot_dir, "config.json"))

    trainer = Trainer(cfg)
    dummy = {
        "corr_pos": np.zeros((1, 64, 6), np.float32),
        "src_keypts": np.zeros((1, 64, 3), np.float32),
        "tgt_keypts": np.zeros((1, 64, 3), np.float32),
        "gt_labels": np.zeros((1, 64), np.float32),
        "gt_trans": np.eye(4, dtype=np.float32)[None],
        "mask": np.ones((1, 64), bool),
    }
    state = trainer.init_state(dummy, steps_per_epoch=1)
    trainer.save_checkpoint(state, "best")

    monkeypatch.chdir(tmp_path)
    from evaluation.test_KITTI import main

    stats, agg = main(["--chosen_snapshot", "ktest", "--num_node", "400"])
    assert stats.shape == (3, 12)
    # identical-latent descriptors -> trivially registrable pairs
    assert agg["pair_recall"] == 100.0
