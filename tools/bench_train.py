#!/usr/bin/env python
"""Training-step throughput benchmark (honest fetch-forced timing).

Measures the full jitted train step (forward + 3 losses + backward +
guarded Adam update). Defaults to the reference training shape (bs=16,
N=1000, 12 layers x 128 channels); --num_node/--batch_size/--fused_attention/
--remat explore the large-N regime the reference cannot train in at all
(its [bs, N, N] x 12-layer attention memory wall, PointDSC.py:150-155).

Example (KITTI-scale training step on one chip):
  python tools/bench_train.py --num_node 12288 --batch_size 1 \
      --fused_attention true --remat true
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data import SyntheticPairDataset, collate_batch
    from pointdsc_tpu.train.config import get_config
    from pointdsc_tpu.train.trainer import Trainer

    cfg = get_config("3DMatch", argv)
    cfg.verbose = False
    cfg.tboard_dir = ""
    bs = cfg.batch_size
    trainer = Trainer(cfg)
    n_batches = 6
    ds = SyntheticPairDataset(num_pairs=bs * n_batches, num_corr=cfg.num_node, seed=0)
    batches = [
        jax.tree_util.tree_map(
            jnp.asarray, collate_batch([ds[i * bs + j] for j in range(bs)])
        )
        for i in range(n_batches)
    ]
    state = trainer.init_state(batches[0], steps_per_epoch=100)
    trainer.build_steps()
    ep = jnp.asarray(1)

    # rtt baseline
    @jax.jit
    def trivial(x):
        return x + 1.0

    np.asarray(trivial(jnp.zeros(4)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.zeros(4)))
        rts.append(time.perf_counter() - t0)
    rtt = float(np.median(rts))

    # warmup/compile
    state, m = trainer._train_step(state, batches[0], ep)
    float(m["loss"])

    ts = []
    for i in range(5):
        b = batches[1 + (i % (n_batches - 1))]
        t0 = time.perf_counter()
        state, m = trainer._train_step(state, b, ep)
        _ = float(m["loss"])  # forces completion
        ts.append(time.perf_counter() - t0)
    step = max(float(np.median(ts)) - rtt, 1e-9)
    variant = []
    if cfg.fused_attention:
        variant.append("fused")
    if cfg.fused_sm_loss:
        variant.append("smloss")
    if cfg.remat:
        variant.append("remat")
    if cfg.half_precision:
        variant.append("bf16")
    tag = "+".join(variant) or "dense"
    print(
        f"train step [{tag}] (bs={bs}, N={cfg.num_node}, {cfg.num_layers}L): "
        f"{step*1000:.2f} ms -> {bs/step:.1f} pairs/sec, {1/step:.2f} steps/sec "
        f"(rtt {rtt*1000:.1f} ms)"
    )
    return step


if __name__ == "__main__":
    main()
