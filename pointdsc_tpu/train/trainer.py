"""Trainer: jitted data-parallel train/eval steps + host-side epoch loop.

Rebuilds /root/reference/libs/trainer.py as a TPU program: the whole
iteration (forward, three losses, backward, non-finite-grad guard, optimizer
update) is ONE jitted function, sharded over a data-parallel device mesh.
The host loop only feeds batches and reads back scalar meters.

Kept from the reference:
  * eval-before-train at epoch 0 (trainer.py:47)
  * best-snapshot by val registration recall (trainer.py:55-57)
  * skip the optimizer step when any gradient is non-finite (trainer.py:124-130)
  * per-epoch exponential LR decay (ExpLR gamma, train_3DMatch.py:62-66)
  * snapshot naming model_<epoch>.pkl / model_best.pkl (trainer.py:224-226)
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from pointdsc_tpu.models.pointdsc import PointDSC
from pointdsc_tpu.parallel.mesh import make_mesh, shard_batch
from pointdsc_tpu.train.config import Config
from pointdsc_tpu.train.losses import (
    classification_loss,
    classification_metrics,
    spectral_matching_loss,
    transformation_loss,
)
from pointdsc_tpu.utils.timer import AverageMeter, Timer
from pointdsc_tpu.utils.logging import MetricsLogger


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """ADAM/SGD + per-epoch exponential decay, matching torch semantics
    (weight decay added to the gradient *before* the Adam moments).

    An epoch actually runs min(training_max_iter, steps_per_epoch) iterations
    (train_epoch), so the staircase must step on that count to match the
    reference's epoch-stepped ExponentialLR.
    """
    actual_steps = min(cfg.training_max_iter, steps_per_epoch)
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(1, actual_steps * cfg.scheduler_interval),
        decay_rate=cfg.scheduler_gamma,
        staircase=True,
    )
    if cfg.optimizer == "SGD":
        core = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
    else:
        core = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(schedule),
        )
    return core


class Trainer:
    def __init__(self, cfg: Config, model: PointDSC | None = None):
        self.cfg = cfg
        self.model = model or PointDSC(
            in_dim=cfg.in_dim,
            num_layers=cfg.num_layers,
            num_channels=cfg.num_channels,
            num_iterations=cfg.num_iterations,
            ratio=cfg.ratio,
            inlier_threshold=cfg.inlier_threshold,
            sigma_d=cfg.sigma_d,
            k=cfg.k,
            nms_radius=cfg.nms_radius,
            half_precision=cfg.half_precision,
            remat=cfg.remat,
        )
        # data parallelism requires batch_size % n_devices == 0; use the
        # largest device count that divides the batch
        n_avail = cfg.num_devices or jax.device_count()
        n_use = max(d for d in range(1, n_avail + 1) if cfg.batch_size % d == 0)
        self.mesh = make_mesh(n_use)
        self.logger = MetricsLogger(cfg.tboard_dir) if cfg.tboard_dir else None
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def init_state(self, example_batch, steps_per_epoch: int, seed: int = 0) -> TrainState:
        variables = self.model.init(
            jax.random.key(seed),
            jnp.asarray(example_batch["corr_pos"]),
            jnp.asarray(example_batch["src_keypts"]),
            jnp.asarray(example_batch["tgt_keypts"]),
            mask=jnp.asarray(example_batch["mask"]),
        )
        self.tx = make_optimizer(self.cfg, steps_per_epoch)
        opt_state = self.tx.init(variables["params"])
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )
        if self.cfg.pretrain:
            state = self.load_checkpoint(self.cfg.pretrain, state)
        return state

    # ------------------------------------------------------------------
    def _loss_and_metrics(self, params, batch_stats, batch, epoch):
        cfg = self.cfg
        out, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["corr_pos"],
            batch["src_keypts"],
            batch["tgt_keypts"],
            mask=batch["mask"],
            train=True,
            fused_attention=cfg.fused_attention,
            skip_M=cfg.fused_sm_loss,
            mutable=["batch_stats"],
        )
        gt_labels, mask = batch["gt_labels"], batch["mask"]
        class_loss = classification_loss(
            out.final_labels, gt_labels, mask, balanced=cfg.balanced
        )
        # reference wires config.balanced into BOTH losses (train_3DMatch.py:104-105)
        if cfg.fused_sm_loss:
            # tile-wise Pallas loss: identical value/grads to the dense
            # chain (tests/test_sm_loss_kernel.py) with no [B, N, N] tensor
            # in either pass
            from pointdsc_tpu.kernels.sm_loss import fused_spectral_matching_loss

            sm_loss = fused_spectral_matching_loss(
                out.normed_features, out.sigma, gt_labels, mask, cfg.balanced
            )
        else:
            sm_loss = spectral_matching_loss(
                out.M, gt_labels, mask, balanced=cfg.balanced
            )
        tl = transformation_loss(
            out.final_trans,
            batch["gt_trans"],
            batch["src_keypts"],
            batch["tgt_keypts"],
            out.final_labels,
            mask,
            re_thre=cfg.re_thre,
            te_thre=cfg.te_thre,
        )
        loss = cfg.weight_classification * class_loss + cfg.weight_spectralmatching * sm_loss
        if cfg.weight_transformation > 0.0:  # static: keeps the backward graph lean
            loss = loss + jnp.where(
                epoch > cfg.transformation_loss_start_epoch,
                cfg.weight_transformation * tl.loss,
                0.0,
            )

        cmetrics = classification_metrics(out.final_labels, gt_labels, mask)
        metrics = {
            "loss": loss,
            "class_loss": class_loss,
            "sm_loss": sm_loss,
            "trans_loss": tl.loss,
            "reg_recall": tl.recall,
            "re": tl.re,
            "te": tl.te,
            **cmetrics,
        }
        return loss, (updates["batch_stats"], metrics)

    # ------------------------------------------------------------------
    def build_steps(self):
        model = self.model

        @jax.jit
        def train_step(state: TrainState, batch, epoch):
            grad_fn = jax.value_and_grad(self._loss_and_metrics, has_aux=True)
            (loss, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch, epoch
            )
            # non-finite-gradient guard (reference trainer.py:124-130)
            finite = jnp.all(
                jnp.asarray(
                    [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
                )
            )
            grads = jax.tree_util.tree_map(lambda g: jnp.where(finite, g, 0.0), grads)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            # if not finite: keep everything (zero grads still advance Adam
            # moments; suppress that too by keeping the old opt state)
            new_opt = jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new_opt, state.opt_state
            )
            new_params = jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new_params, state.params
            )
            metrics["grad_finite"] = finite.astype(jnp.float32)
            return (
                TrainState(new_params, new_stats, new_opt, state.step + 1),
                metrics,
            )

        @jax.jit
        def eval_step(state: TrainState, batch):
            cfg = self.cfg
            out, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["corr_pos"],
                batch["src_keypts"],
                batch["tgt_keypts"],
                mask=batch["mask"],
                train=False,
                fused_attention=cfg.fused_attention,
                skip_M=cfg.fused_sm_loss,
                mutable=["batch_stats"],
            )
            gt_labels, mask = batch["gt_labels"], batch["mask"]
            class_loss = classification_loss(
                out.final_labels, gt_labels, mask, balanced=cfg.balanced
            )
            if cfg.fused_sm_loss:
                from pointdsc_tpu.kernels.sm_loss import (
                    fused_spectral_matching_loss,
                )

                sm_loss = fused_spectral_matching_loss(
                    out.normed_features, out.sigma, gt_labels, mask,
                    cfg.balanced,
                )
            else:
                sm_loss = spectral_matching_loss(
                    out.M, gt_labels, mask, balanced=cfg.balanced
                )
            tl = transformation_loss(
                out.final_trans,
                batch["gt_trans"],
                batch["src_keypts"],
                batch["tgt_keypts"],
                out.final_labels,
                mask,
                re_thre=cfg.re_thre,
                te_thre=cfg.te_thre,
            )
            cmetrics = classification_metrics(out.final_labels, gt_labels, mask)
            return {
                "class_loss": class_loss,
                "sm_loss": sm_loss,
                "trans_loss": tl.loss,
                "reg_recall": tl.recall,
                "re": tl.re,
                "te": tl.te,
                **cmetrics,
            }

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------
    def train(self, train_loader, val_loader, state: TrainState) -> TrainState:
        cfg = self.cfg
        if self._train_step is None:
            self.build_steps()
        best_recall = -1.0

        res = self.evaluate(val_loader, state)
        print(
            f"Evaluation: Epoch 0: SM Loss {res['sm_loss']:.2f} "
            f"Class Loss {res['class_loss']:.2f} Trans Loss {res['trans_loss']:.2f} "
            f"Recall {res['reg_recall']:.2f}"
        )
        for epoch in range(cfg.max_epoch):
            state = self.train_epoch(train_loader, state, epoch + 1)
            if (epoch + 1) % cfg.evaluate_interval == 0 or epoch == 0:
                res = self.evaluate(val_loader, state)
                print(
                    f"Evaluation: Epoch {epoch + 1}: SM Loss {res['sm_loss']:.2f} "
                    f"Class Loss {res['class_loss']:.2f} "
                    f"Trans Loss {res['trans_loss']:.2f} Recall {res['reg_recall']:.2f}"
                )
                if self.logger:
                    self.logger.log_dict("Val", res, epoch + 1)
                if res["reg_recall"] > best_recall:
                    best_recall = res["reg_recall"]
                    self.save_checkpoint(state, "best")
            if (epoch + 1) % cfg.snapshot_interval == 0:
                self.save_checkpoint(state, epoch + 1)
        return state

    # ------------------------------------------------------------------
    def train_epoch(self, loader, state: TrainState, epoch: int) -> TrainState:
        cfg = self.cfg
        meters = {k: AverageMeter() for k in (
            "loss", "class_loss", "sm_loss", "trans_loss", "reg_recall",
            "re", "te", "precision", "recall", "f1",
        )}
        data_timer, model_timer = Timer(), Timer()
        epoch_j = jnp.asarray(epoch, jnp.int32)

        it = iter(loader)
        num_iter = min(cfg.training_max_iter, len(loader))
        # Metrics stay on device between log points: a per-step float() fetch
        # would serialize host and device (every step waits for the previous
        # one's full pipeline). We buffer the tiny scalar dicts and fetch the
        # whole window at the reference's 100-iter logging cadence
        # (libs/trainer.py:142-156).
        LOG_EVERY = 100
        pending: list[dict] = []

        def drain():
            if not pending:
                return
            for md in jax.device_get(pending):
                if np.isfinite(md["loss"]):
                    for k, m in meters.items():
                        if np.isfinite(md[k]):
                            m.update(float(md[k]))
            pending.clear()

        for i in range(num_iter):
            data_timer.tic()
            batch = next(it)
            batch = shard_batch(batch, self.mesh)
            data_timer.toc()

            model_timer.tic()
            state, metrics = self._train_step(state, batch, epoch_j)
            pending.append(metrics)
            last = (i + 1) == num_iter
            if (i + 1) % LOG_EVERY == 0 or last:
                drain()  # blocks until the device catches up
            model_timer.toc()

            if ((i + 1) % LOG_EVERY == 0 or last) and cfg.verbose:
                if self.logger:
                    self.logger.log_dict(
                        "Train",
                        {k: m.avg for k, m in meters.items()},
                        (epoch - 1) * num_iter + i,
                    )
                print(
                    f"Epoch: {epoch} [{i + 1:4d}/{num_iter}] "
                    f"sm_loss: {meters['sm_loss'].avg:.2f} "
                    f"class_loss: {meters['class_loss'].avg:.2f} "
                    f"reg_recall: {meters['reg_recall'].avg:.2f}% "
                    f"re: {meters['re'].avg:.2f}deg te: {meters['te'].avg:.2f}cm "
                    f"data: {data_timer.avg:.3f}s model: {model_timer.avg:.3f}s"
                )
        return state

    # ------------------------------------------------------------------
    def evaluate(self, loader, state: TrainState) -> dict:
        cfg = self.cfg
        if self._eval_step is None:
            self.build_steps()
        meters: dict[str, AverageMeter] = {}
        it = iter(loader)
        num_iter = min(cfg.val_max_iter, len(loader))
        pending = []
        for _ in range(num_iter):
            batch = shard_batch(next(it), self.mesh)
            pending.append(self._eval_step(state, batch))
        for metrics in jax.device_get(pending):
            for k, v in metrics.items():
                v = float(v)
                if np.isfinite(v):
                    meters.setdefault(k, AverageMeter()).update(v)
        return {k: m.avg for k, m in meters.items()}

    # ------------------------------------------------------------------
    def save_checkpoint(self, state: TrainState, tag) -> str:
        os.makedirs(self.cfg.save_dir, exist_ok=True)
        path = os.path.join(self.cfg.save_dir, f"model_{tag}.pkl")
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        if self.cfg.verbose:
            print(f"Save model to {path}")
        return path

    def load_checkpoint(self, path: str, state: TrainState) -> TrainState:
        with open(path, "rb") as f:
            payload = serialization.from_bytes(
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": state.step,
                },
                f.read(),
            )
        print(f"Load model from {path}")
        return TrainState(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=payload["step"],
        )


def load_model_weights(model: PointDSC, checkpoint_path: str, example_inputs) -> dict:
    """Eval-side loader: returns {'params', 'batch_stats'} from a snapshot.

    `example_inputs` = (corr_pos, src_keypts, tgt_keypts) used to build the
    target pytree structure for deserialization.
    """
    variables = model.init(jax.random.key(0), *example_inputs)
    with open(checkpoint_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(variables["params"], raw["params"])
    batch_stats = serialization.from_state_dict(
        variables.get("batch_stats", {}), raw.get("batch_stats", {})
    )
    return {"params": params, "batch_stats": batch_stats}
