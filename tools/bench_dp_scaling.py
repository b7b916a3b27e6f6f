#!/usr/bin/env python
"""Data-parallel scaling evidence on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment, and the
8 virtual `xla_force_host_platform` devices share one host's physical
cores — wall-clock speedup is physically impossible there (a 1-device XLA
CPU program already uses every core via intra-op threading). So instead of
a meaningless wall-clock ratio this tool extracts the evidence that the dp
layer actually scales:

1. partitioning: per-device shard shapes of the train batch and the
   sharded-eval fan-out (batch axis split N ways, parameters replicated);
2. communication: the collectives in the compiled train-step HLO and their
   byte volume (dp should need exactly one gradient/metric all-reduce of
   ~param-size bytes per step, nothing resharded per layer);
3. an analytic efficiency number: measured single-chip step time (from
   tools/bench_train.py on the real chip) vs the all-reduce time at ICI
   bandwidth, the standard dp efficiency model.

  python tools/bench_dp_scaling.py [--devices 8]
"""

import argparse
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# measured on one v5e chip (tools/bench_train.py, docs/PERF.md): fused
# train step at the reference shape; and public v5e ICI bandwidth
SINGLE_CHIP_STEP_MS = 17.5
ICI_BYTES_PER_S = 4.5e10  # ~45 GB/s per direction per link (v5e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--num_node", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pointdsc_tpu.data import SyntheticPairDataset, collate_batch
    from pointdsc_tpu.parallel.mesh import make_mesh, shard_batch
    from pointdsc_tpu.train.config import get_config
    from pointdsc_tpu.train.trainer import Trainer

    cfg = get_config("3DMatch", [
        "--num_node", str(args.num_node),
        "--batch_size", str(args.batch_size),
        "--num_layers", "12", "--num_channels", "128", "--k", "40",
        "--num_devices", str(args.devices),
    ])
    cfg.verbose = False
    cfg.tboard_dir = ""
    bs = cfg.batch_size
    trainer = Trainer(cfg)
    ds = SyntheticPairDataset(num_pairs=bs, num_corr=cfg.num_node, seed=0)
    batch = jax.tree_util.tree_map(
        jnp.asarray, collate_batch([ds[j] for j in range(bs)])
    )
    state = trainer.init_state(batch, steps_per_epoch=100)
    trainer.build_steps()

    # ---- 1. partitioning evidence
    sharded = shard_batch(batch, trainer.mesh)
    cp = sharded["corr_pos"]
    shard_shape = cp.sharding.shard_shape(cp.shape)
    print(f"mesh: {trainer.mesh.shape}")
    print(f"batch corr_pos: global {tuple(cp.shape)} -> per-device {shard_shape}")
    assert shard_shape[0] == cp.shape[0] // args.devices, "batch axis not split"

    # ---- 2. communication evidence from the compiled step
    ep = jnp.asarray(1)
    lowered = trainer._train_step.lower(state, sharded, ep)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    allreduce_bytes = 0
    n_collectives = 0
    # HLO lines look like:  %all-reduce.3 = f32[32,32]{1,0} all-reduce(...)
    for line in hlo.splitlines():
        if "all-reduce(" not in line:
            continue
        result = line.split("all-reduce(")[0]  # shapes of the op result(s)
        for dtype, dims in re.findall(r"([a-z][a-z0-9]+)\[([0-9,]*)\]", result):
            size = np.prod([int(d) for d in dims.split(",") if d] or [1])
            bytes_per = (
                2 if dtype.endswith("16") else 8 if dtype.endswith("64") else 4
            )
            allreduce_bytes += int(size) * bytes_per
            n_collectives += 1
    params_bytes = sum(
        int(np.prod(p.shape)) * 4 for p in jax.tree_util.tree_leaves(state.params)
    )
    print(f"compiled step: {n_collectives} all-reduce tensors, "
          f"{allreduce_bytes / 1e3:.1f} KB total "
          f"(param tree = {params_bytes / 1e6:.2f} MB)")

    # sanity: one step on the mesh must run; params come back replicated
    new_state, metrics = trainer._train_step(state, sharded, ep)
    p0 = jax.tree_util.tree_leaves(new_state.params)[0]
    print(f"post-step param sharding: {p0.sharding}")
    print(f"step on {args.devices}-device mesh OK, loss={float(metrics['loss']):.4f}")

    # ---- 3. analytic dp efficiency at real-chip numbers
    # ring all-reduce moves 2(n-1)/n * bytes per chip over ICI
    n = args.devices
    ar_bytes = max(allreduce_bytes, params_bytes)  # grads ~ param tree
    ar_ms = 2 * (n - 1) / n * ar_bytes / ICI_BYTES_PER_S * 1e3
    eff = SINGLE_CHIP_STEP_MS / (SINGLE_CHIP_STEP_MS + ar_ms)
    print(
        f"predicted dp efficiency at {n} chips: "
        f"{eff:.1%} (step {SINGLE_CHIP_STEP_MS} ms vs all-reduce {ar_ms:.2f} ms "
        f"at {ICI_BYTES_PER_S / 1e9:.0f} GB/s ICI)"
    )


if __name__ == "__main__":
    main()
