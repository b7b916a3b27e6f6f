"""Compile-and-run every Pallas kernel family on the real TPU backend.

The test suite runs the kernels in interpret mode on CPU, which validates
semantics but NOT Mosaic lowering: a primitive with no TPU lowering (e.g.
`dynamic_update_slice` or a float `iota` inside a kernel body) passes every
CPU test and then crashes the first real-chip dispatch. This tool exercises
each fused execution path once on the attached TPU at the smallest shapes
that reach it, so a lowering regression is caught in seconds instead of at
`bench.py` time.

Paths covered (gates in models/pointdsc.py + kernels/encoder_layer.py):
  - N=1024:  compat cache, whole-layer fused encoder, fused NMS/scoring/
             refinement/confidence, XLA exact_topk NSM selection
  - N=4096:  fused exact seed-kNN kernel (gate: N >= 4096)
  - N=12288: split whole-layer fusion (gate: N > 6144), approx-knn variant
             — the exact shape bench.py's n12k line dispatches
  - SP:      rectangular [n_loc, N] compat-cache + cached-flash kernels,
             exactly the per-device calls of sp_encode_fused
  - train:   custom-VJP flash attention + fused SM loss (fwd+bwd)
  - nn_search: tiled NN kernel (ICP / information matrices)

Run: `python tools/tpu_smoke.py` (needs the TPU tunnel; exits non-zero if
any path fails to lower or execute). Pass --require-tpu to also exit
non-zero when no TPU backend is attached (for automated gates, where a
downed tunnel must not read as a pass).

docs/WORKFLOW.md step 0: run this after ANY edit under pointdsc_tpu/kernels/
before committing — interpret-mode CPU tests validate semantics but not
Mosaic lowering.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    require_tpu = "--require-tpu" in sys.argv or os.environ.get(
        "TPU_SMOKE_REQUIRE_TPU", ""
    ) not in ("", "0")
    if jax.default_backend() != "tpu":
        if require_tpu:
            print("tpu_smoke: FAIL — no TPU backend attached "
                  "(--require-tpu set)")
            return 1
        print("tpu_smoke: no TPU backend attached; nothing to validate")
        return 0

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC

    failures = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            jax.tree.map(np.asarray, out)
            print(f"  ok   {name} ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report every path
            failures.append(name)
            print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:300]}")

    print(f"tpu_smoke on {jax.devices()[0]}")

    model = PointDSC(in_dim=6, num_layers=12, num_channels=128, k=40,
                     ratio=0.1)
    s0 = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=0)[0]
    init_args = tuple(
        jnp.asarray(s0[k])[None] for k in ("corr_pos", "src_keypts",
                                           "tgt_keypts")
    )
    variables = model.init(jax.random.key(0), *init_args)

    def eval_at(n, m):
        s = SyntheticPairDataset(num_pairs=1, num_corr=n, seed=1)[0]
        args = tuple(
            jnp.asarray(s[k])[None] for k in ("corr_pos", "src_keypts",
                                              "tgt_keypts")
        )
        out = m.apply(variables, *args, testing=True, fused_attention=True)
        return out.final_trans

    check("fused eval N=1024 (whole-layer kernel, NMS/score/refine/conf)",
          lambda: eval_at(1024, model))
    check("fused eval N=4096 (fused exact seed-kNN)",
          lambda: eval_at(4096, model))
    check("fused eval N=12288 approx (split layer fusion, bench n12k shape)",
          lambda: eval_at(12288, model.clone(approx_knn=True)))

    def sp_rect_kernels():
        # the per-device calls of parallel/seq_parallel.py::sp_encode_fused,
        # run directly on one chip with rectangular [n_loc, N] shapes
        from pointdsc_tpu.kernels.sc_attention import (
            _build_compat_cache_single,
            _fused_sc_attention_cached_single,
            pack_geometry,
        )

        rng = np.random.default_rng(0)
        n, d, c = 4096, 4, 128
        n_loc = n // d
        src = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        tgt = src + 0.01 * jnp.asarray(
            rng.standard_normal((n, 3)).astype(np.float32))
        m = jnp.ones((n,), bool)
        geom_rows = pack_geometry(src[:n_loc], tgt[:n_loc], m[:n_loc])
        geom_cols = pack_geometry(src, tgt, m)
        cache = _build_compat_cache_single(
            geom_rows, 0.1, block_q=1024, block_k=1024, interpret=False,
            geom_cols=geom_cols,
        )
        q = jnp.asarray(
            rng.standard_normal((n_loc, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((n, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        v = jnp.asarray(
            rng.standard_normal((n, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        out_off = _fused_sc_attention_cached_single(
            q, k, v, cache, geom_cols, block_q=1024, block_k=1024,
            interpret=False,
        )
        # the running-max variant is the regime-guard fallback
        # (models/regime.py) — selected at checkpoint load for imported
        # weights whose norms exceed the offset-softmax regime
        out_rm = _fused_sc_attention_cached_single(
            q, k, v, cache, geom_cols, block_q=1024, block_k=1024,
            interpret=False, offset_softmax=False,
        )
        return out_off, out_rm

    check("SP rectangular kernels (per-device sp_encode_fused calls)",
          sp_rect_kernels)

    def train_step():
        from pointdsc_tpu.data import collate_batch
        from pointdsc_tpu.train.config import get_config
        from pointdsc_tpu.train.trainer import Trainer

        cfg = get_config("3DMatch", [
            "--fused_attention", "true", "--fused_sm_loss", "true",
            "--batch_size", "2", "--num_node", "256",
        ])
        cfg.verbose = False
        cfg.tboard_dir = ""
        trainer = Trainer(cfg)
        ds = SyntheticPairDataset(num_pairs=2, num_corr=256, seed=0)
        batch = jax.tree_util.tree_map(
            jnp.asarray, collate_batch([ds[0], ds[1]])
        )
        state = trainer.init_state(batch, steps_per_epoch=10)
        trainer.build_steps()
        state, m = trainer._train_step(state, batch, jnp.asarray(1))
        return m["loss"]

    check("train step (flash-attn VJP + fused SM loss)", train_step)

    def nn_search():
        from pointdsc_tpu.kernels.nn_search import nearest_neighbors

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2048, 3)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((4096, 3)).astype(np.float32))
        return nearest_neighbors(q, b)

    check("nn_search kernel", nn_search)

    if failures:
        print(f"tpu_smoke: {len(failures)} FAILURES: {failures}")
        return 1
    print("tpu_smoke: all fused paths lower and execute on TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
