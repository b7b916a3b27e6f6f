#!/usr/bin/env python
"""Train PointDSC-TPU on 3DMatch (CLI parity with the reference
/root/reference/train_3DMatch.py).

Usage: python train_3DMatch.py --root /data/3DMatch --descriptor fcgf ...
Snapshot contract: writes config.json + checkpoints under
snapshot/<exp_id>/ exactly like the reference (train_3DMatch.py:21-33).
"""

import os

from pointdsc_tpu.data.pipeline import Loader
from pointdsc_tpu.data.threedmatch import ThreeDMatchTrainVal
from pointdsc_tpu.train.config import get_config
from pointdsc_tpu.train.trainer import Trainer
from pointdsc_tpu.utils.seed import set_seed


def _copy_sources(snapshot_dir):
    """Reproducibility snapshot: copy the training-relevant sources into the
    snapshot dir (reference train_3DMatch.py:24-33)."""
    import shutil

    here = os.path.dirname(os.path.abspath(__file__))
    for rel in (
        "train_3DMatch.py",
        "pointdsc_tpu/train/trainer.py",
        "pointdsc_tpu/train/losses.py",
        "pointdsc_tpu/models/pointdsc.py",
        "pointdsc_tpu/data/threedmatch.py",
    ):
        src = os.path.join(here, rel)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(snapshot_dir, os.path.basename(rel)))


def main(argv=None):
    cfg = get_config("3DMatch", argv)
    set_seed(cfg.seed)

    os.makedirs(cfg.snapshot_dir, exist_ok=True)
    os.makedirs(cfg.save_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.snapshot_dir, "config.json"))
    _copy_sources(cfg.snapshot_dir)

    common = dict(
        root=cfg.root,
        descriptor=cfg.descriptor,
        in_dim=cfg.in_dim,
        inlier_threshold=cfg.inlier_threshold,
        num_node=cfg.num_node,
        use_mutual=cfg.use_mutual,
    )
    train_set = ThreeDMatchTrainVal(
        split="train",
        augment_axis=cfg.augment_axis,
        augment_rotation=cfg.augment_rotation,
        augment_translation=cfg.augment_translation,
        **common,
    )
    val_set = ThreeDMatchTrainVal(
        split="val",
        augment_axis=cfg.augment_axis,
        augment_rotation=cfg.augment_rotation,
        augment_translation=cfg.augment_translation,
        **common,
    )
    train_loader = Loader(
        train_set, cfg.batch_size, shuffle=True, num_workers=cfg.num_workers
    )
    val_loader = Loader(
        val_set, cfg.batch_size, shuffle=False, num_workers=cfg.num_workers
    )

    trainer = Trainer(cfg)
    example = next(iter(train_loader))
    state = trainer.init_state(example, steps_per_epoch=len(train_loader))
    trainer.build_steps()
    trainer.train(train_loader, val_loader, state)


if __name__ == "__main__":
    main()
