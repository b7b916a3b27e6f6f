#!/usr/bin/env python
"""Sequence-parallel scaling evidence on the virtual CPU mesh.

Like tools/bench_dp_scaling.py: the 8 virtual host devices share one
machine's cores, so wall-clock speedup is physically meaningless here.
This tool instead extracts the evidence that the SP layer
(parallel/seq_parallel.py) actually scales a single pair's N² encoder:

1. partitioning: the per-device shard shapes of the encoder output and the
   per-device int8 compat-cache bytes (the HBM-dominant object) — N²/D;
2. communication: the collectives in the compiled sp_encode HLO and their
   byte volume — SP should need exactly the O(N·C) key/value all-gathers
   per layer (bf16 on the fused path) plus the one-time coordinate/mask
   gathers, nothing N²-shaped;
3. an analytic efficiency number at a target N from the measured
   single-chip per-layer time (docs/PERF.md: split whole-layer kernel,
   0.865 ms/layer at N=20480, N²-scaled) vs the ring all-gather time at
   ICI bandwidth.

  python tools/bench_sp_scaling.py [--devices 8] [--num_node 2048]
                                   [--target_n 65536]
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

# measured on one v5e chip (docs/PERF.md: split whole-layer fusion at
# N=20480); per-layer encoder time scales ~N^2 in this HBM-bound regime
LAYER_MS_AT_20K = 0.865
REF_N = 20480
ICI_BYTES_PER_S = 4.5e10  # ~45 GB/s per direction per link (v5e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--num_node", type=int, default=2048)
    ap.add_argument("--target_n", type=int, default=65536)
    ap.add_argument("--num_layers", type=int, default=12)
    ap.add_argument("--num_channels", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC
    from pointdsc_tpu.parallel.seq_parallel import sp_encode

    d = args.devices
    n, c, L = args.num_node, args.num_channels, args.num_layers
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("sp",))
    model = PointDSC(in_dim=6, num_layers=L, num_channels=c, k=40, ratio=0.1)
    s = SyntheticPairDataset(num_pairs=1, num_corr=n, seed=0)[0]
    cp = jnp.asarray(s["corr_pos"])[None]
    sk = jnp.asarray(s["src_keypts"])[None]
    tk = jnp.asarray(s["tgt_keypts"])[None]
    variables = model.init(jax.random.key(0), cp[:, :256], sk[:, :256],
                           tk[:, :256])

    # ---- 1. partitioning evidence
    feats = sp_encode(model, variables, cp, sk, tk, mesh)
    shard_shape = feats.sharding.shard_shape(feats.shape)
    print(f"mesh: {mesh.shape}")
    print(f"features: global {tuple(feats.shape)} -> per-device {shard_shape}")
    assert shard_shape[1] == n // d, "row axis not split"
    cache_gb = args.target_n**2 / 1e9
    print(
        f"int8 compat cache at N={args.target_n}: {cache_gb:.1f} GB total -> "
        f"{cache_gb / d:.2f} GB per device (fused SP path builds only its "
        f"row slice)"
    )

    # ---- 2. communication evidence from the compiled encoder
    fn = jax.jit(
        lambda cp_, s_, t_: sp_encode(model, variables, cp_, s_, t_, mesh)
    )
    hlo = fn.lower(cp, sk, tk).compile().as_text()
    gather_bytes = 0
    n_gathers = 0
    biggest = 0
    for line in hlo.splitlines():
        if "all-gather(" not in line and "all-gather-start(" not in line:
            continue
        result = line.split("all-gather")[0]
        for dtype, dims in re.findall(r"([a-z][a-z0-9]+)\[([0-9,]*)\]", result):
            size = int(np.prod([int(x) for x in dims.split(",") if x] or [1]))
            bytes_per = (
                2 if dtype.endswith("16") else 8 if dtype.endswith("64")
                else 1 if dtype in ("s8", "u8", "pred") else 4
            )
            gather_bytes += size * bytes_per
            biggest = max(biggest, size * bytes_per)
            n_gathers += 1
    # expected: 2 gathers (k, v) of [1, N, C] per layer + coords/mask once
    expected = 2 * L * n * c * 4 + 2 * n * 3 * 4 + n
    print(
        f"compiled sp_encode: {n_gathers} all-gather tensors, "
        f"{gather_bytes / 1e6:.2f} MB total (expected ~{expected / 1e6:.2f} "
        f"MB = 2 k/v gathers x {L} layers + coords/mask); largest "
        f"{biggest / 1e6:.2f} MB"
    )
    assert gather_bytes < 4 * expected, "unexpected N^2-sized collective"
    assert biggest <= n * c * 4 * 2, "a collective larger than [N, C] exists"

    # ---- 3. analytic SP efficiency at the target N (fused path: bf16 k/v)
    tn = args.target_n
    layer_ms_single = LAYER_MS_AT_20K * (tn / REF_N) ** 2
    layer_ms_sp = layer_ms_single / d
    # ring all-gather: each chip receives (d-1)/d of the [N, C] bf16 k and v
    ag_bytes = 2 * (d - 1) / d * tn * c * 2
    ag_ms = ag_bytes / ICI_BYTES_PER_S * 1e3
    eff = layer_ms_sp / (layer_ms_sp + ag_ms)
    print(
        f"predicted SP efficiency at N={tn}, {d} chips: {eff:.1%} "
        f"(per-layer compute {layer_ms_sp:.2f} ms/chip vs k/v all-gather "
        f"{ag_ms:.2f} ms at {ICI_BYTES_PER_S / 1e9:.0f} GB/s ICI, "
        f"un-overlapped worst case); single-chip would need "
        f"{layer_ms_single * args.num_layers:.0f} ms of encoder alone and "
        f"{tn**2 / 1e9:.1f} GB of cache residency"
    )


if __name__ == "__main__":
    main()
