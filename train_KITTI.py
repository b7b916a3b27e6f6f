#!/usr/bin/env python
"""Train PointDSC-TPU on KITTI (CLI parity with /root/reference/train_KITTI.py,
which differs from the 3DMatch entry only in the dataset class)."""

import os

from pointdsc_tpu.data.kitti import KITTIDataset
from pointdsc_tpu.data.pipeline import Loader
from pointdsc_tpu.train.config import get_config
from pointdsc_tpu.train.trainer import Trainer
from pointdsc_tpu.utils.seed import set_seed


def main(argv=None):
    cfg = get_config("KITTI", argv)
    set_seed(cfg.seed)

    os.makedirs(cfg.snapshot_dir, exist_ok=True)
    os.makedirs(cfg.save_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.snapshot_dir, "config.json"))

    common = dict(
        root=cfg.root,
        descriptor=cfg.descriptor,
        in_dim=cfg.in_dim,
        inlier_threshold=cfg.inlier_threshold,
        num_node=cfg.num_node,
        use_mutual=cfg.use_mutual,
        augment_axis=cfg.augment_axis,
        augment_rotation=cfg.augment_rotation,
        augment_translation=cfg.augment_translation,
    )
    train_set = KITTIDataset(split="train", **common)
    val_set = KITTIDataset(split="val", **common)
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
