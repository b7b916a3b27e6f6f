#!/usr/bin/env python
"""Training-step throughput benchmark (honest fetch-forced timing).

Measures the full jitted train step (forward + 3 losses + backward +
guarded Adam update) at the reference training shape: bs=16, N=1000,
12 layers x 128 channels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data import SyntheticPairDataset, collate_batch
    from pointdsc_tpu.train.config import default_config
    from pointdsc_tpu.train.trainer import Trainer

    cfg = default_config("3DMatch")
    cfg.verbose = False
    cfg.tboard_dir = ""
    trainer = Trainer(cfg)
    ds = SyntheticPairDataset(num_pairs=16 * 6, num_corr=cfg.num_node, seed=0)
    batches = [
        jax.tree_util.tree_map(
            jnp.asarray, collate_batch([ds[i * 16 + j] for j in range(16)])
        )
        for i in range(6)
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
        b = batches[1 + (i % 5)]
        t0 = time.perf_counter()
        state, m = trainer._train_step(state, b, ep)
        _ = float(m["loss"])  # forces completion
        ts.append(time.perf_counter() - t0)
    step = max(float(np.median(ts)) - rtt, 1e-9)
    print(
        f"train step (bs=16, N=1000, 12L): {step*1000:.2f} ms "
        f"-> {16/step:.1f} pairs/sec, {1/step:.2f} steps/sec "
        f"(rtt {rtt*1000:.1f} ms)"
    )


if __name__ == "__main__":
    main()
