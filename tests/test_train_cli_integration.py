"""train_3DMatch.py CLI end-to-end on a generated reference-format root.

Exercises: split txt parsing, overlap pair lists, fragment feature loading,
augmentation, correspondence building, the full Trainer loop, snapshot
writing (config.json + model_best.pkl + source copies).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointdsc_tpu.data import transforms_np as T

SCENE = "sun3d-test-scene"


def write_fake_train_root(root, rng, num_frag=6, n_pts=400):
    feat_dir = os.path.join(root, "threedmatch_feat")
    list_dir = os.path.join(root, "threedmatch")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(list_dir, exist_ok=True)

    world = rng.uniform(-1.5, 1.5, (3000, 3))
    desc = rng.normal(size=(3000, 32))
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)

    names = []
    for i in range(num_frag):
        sel = rng.choice(3000, n_pts, replace=False)
        pose = T.integrate_trans(
            T.rotation_matrix(3, 0.05, rng), T.translation_matrix(0.2, rng)
        )
        local = T.transform(world[sel], np.linalg.inv(pose))
        name = f"{SCENE}_{i:03d}.npz"
        np.savez(
            os.path.join(feat_dir, name.replace(".npz", "_fcgf.npz")),
            xyz=local.astype(np.float32),
            feature=desc[sel].astype(np.float32),
        )
        names.append(name)

    pairs = [
        f"{names[i]} {names[j]} 0.5"
        for i in range(num_frag)
        for j in range(i + 1, num_frag)
    ]
    with open(os.path.join(list_dir, f"{SCENE}@seq-01-0.30.txt"), "w") as f:
        f.write("\n".join(pairs) + "\n")

    # split files naming the scene prefix
    split_dir = os.path.join(root, "splits")
    os.makedirs(split_dir, exist_ok=True)
    for split in ("train", "val"):
        with open(os.path.join(split_dir, f"{split}_3dmatch.txt"), "w") as f:
            f.write(SCENE + "\n")
    return split_dir


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "data")
    split_dir = write_fake_train_root(root, rng)

    monkeypatch.chdir(tmp_path)

    # drive the dataset directly with the custom split dir, then the Trainer
    # through the same construction train_3DMatch.main performs
    from pointdsc_tpu.data.pipeline import Loader
    from pointdsc_tpu.data.threedmatch import ThreeDMatchTrainVal
    from pointdsc_tpu.train.config import default_config
    from pointdsc_tpu.train.trainer import Trainer
    from train_3DMatch import _copy_sources

    cfg = default_config("3DMatch")
    cfg.num_layers = 2
    cfg.num_channels = 32
    cfg.k = 12
    cfg.num_node = 128
    cfg.batch_size = 8  # must be divisible by the 8-device mesh
    cfg.max_epoch = 1
    cfg.training_max_iter = 2
    cfg.val_max_iter = 1
    cfg.verbose = False
    cfg.root = root
    cfg.snapshot_dir = str(tmp_path / "snapshot" / "t")
    cfg.save_dir = os.path.join(cfg.snapshot_dir, "models")
    cfg.tboard_dir = ""
    os.makedirs(cfg.save_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.snapshot_dir, "config.json"))
    _copy_sources(cfg.snapshot_dir)

    common = dict(
        root=cfg.root, descriptor="fcgf", in_dim=6,
        inlier_threshold=cfg.inlier_threshold, num_node=cfg.num_node,
        use_mutual=False, split_dir=split_dir,
    )
    train_set = ThreeDMatchTrainVal(split="train", **common)
    val_set = ThreeDMatchTrainVal(split="val", **common)
    assert len(train_set) == 15  # all fragment pairs listed

    train_loader = Loader(train_set, cfg.batch_size, shuffle=True, num_workers=2)
    val_loader = Loader(val_set, cfg.batch_size, shuffle=False, num_workers=2)

    trainer = Trainer(cfg)
    example = next(iter(train_loader))
    state = trainer.init_state(example, steps_per_epoch=len(train_loader))
    trainer.build_steps()
    trainer.train(train_loader, val_loader, state)

    files = os.listdir(cfg.save_dir)
    assert any("best" in f for f in files)
    assert os.path.exists(os.path.join(cfg.snapshot_dir, "trainer.py"))
    assert os.path.exists(os.path.join(cfg.snapshot_dir, "config.json"))
