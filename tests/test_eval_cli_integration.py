"""End-to-end eval CLI integration on a synthetic fake-3DMatch data root.

Builds a miniature data root in the reference's exact file layout (fragment
.npz files with xyz/feature keys, gt_result/<scene>-evaluation/gt.log),
writes a snapshot (config.json + model_best.pkl), then drives
evaluation/test_3DMatch.py's main() -- validating the config round-trip,
weight loading, gt.log parsing, correspondence construction and the stats
protocol in one pass.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointdsc_tpu.data import transforms_np as T
from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.train.config import default_config
from pointdsc_tpu.train.trainer import Trainer


SCENE = "7-scenes-redkitchen"


def write_fake_root(root, rng, num_frag=3, n_pts=400):
    """Fragments = views of a common cloud with known world poses."""
    world = rng.uniform(-1.5, 1.5, (3000, 3))
    # shared latent descriptors so NN matching recovers true correspondences
    world_desc = rng.normal(size=(3000, 32))
    world_desc /= np.linalg.norm(world_desc, axis=-1, keepdims=True)

    poses = [np.eye(4)]
    for _ in range(num_frag - 1):
        poses.append(
            poses[-1] @ T.integrate_trans(
                T.rotation_matrix(3, 0.05, rng), T.translation_matrix(0.3, rng)
            )
        )

    frag_dir = os.path.join(root, "fragments", SCENE)
    os.makedirs(frag_dir, exist_ok=True)
    sel_indices = []
    for i, pose in enumerate(poses):
        sel = rng.choice(3000, n_pts, replace=False)
        sel_indices.append(sel)
        local = T.transform(world[sel], np.linalg.inv(pose))
        local += rng.normal(size=local.shape) * 0.002
        np.savez(
            os.path.join(frag_dir, f"cloud_bin_{i}_fcgf.npz"),
            xyz=local.astype(np.float32),
            feature=world_desc[sel].astype(np.float32),
        )

    # gt.log: blocks "i j n" + 4x4; convention: stored transform is
    # tgt -> src (the dataset inverts it, ThreeDMatch.py:259)
    gt_dir = os.path.join(root, "gt_result", f"{SCENE}-evaluation")
    os.makedirs(gt_dir, exist_ok=True)
    lines = []
    for i in range(num_frag):
        for j in range(i + 1, num_frag):
            # src=i, tgt=j: src->tgt = inv(pose_j) @ pose_i
            src_to_tgt = np.linalg.inv(poses[j]) @ poses[i]
            stored = np.linalg.inv(src_to_tgt)
            lines.append(f"{i}\t{j}\t{num_frag}")
            for r in range(4):
                lines.append("\t".join(f"{v:.8f}" for v in stored[r]))
    with open(os.path.join(gt_dir, "gt.log"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return poses


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "data")
    write_fake_root(root, rng)

    # build a snapshot: small model + random weights
    cfg = default_config("3DMatch")
    cfg.num_layers = 2
    cfg.num_channels = 32
    cfg.k = 16
    cfg.ratio = 0.2
    cfg.root = root
    cfg.exp_id = "itest"
    cfg.snapshot_dir = str(tmp_path / "snapshot" / "itest")
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
    from evaluation.test_3DMatch import main

    stats, agg = main(["--chosen_snapshot", "itest", "--save_npy", "true"])
    assert stats.shape[1] == 12
    assert stats.shape[0] == 3  # 3 pairs for 3 fragments
    # descriptors are shared latents -> near-perfect correspondences; even a
    # random encoder must register these easy pairs
    assert agg["pair_recall"] >= 2 / 3 * 100 - 1e-6
    assert os.path.exists(tmp_path / "logs")
