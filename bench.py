#!/usr/bin/env python
"""Flagship benchmark: end-to-end PointDSC inference on one TPU chip.

Measures per-pair latency of the full testing-mode pipeline (spatial
consistency, 12-layer SC-attention encoder, NMS seeds, NSM, Procrustes
hypotheses, post-refinement) at ~5000 correspondences -- the 3DMatch 'all'
eval regime (BASELINE.md: eval correspondence counts ~5k).

Methodology (round-2, fixing the round-1 RTT confound): EVERY variant is
stream-measured -- 32 pairs per dispatch via lax.map, median of 5 runs,
with the tunnel RTT re-measured interleaved with every rep (it drifts by
several ms over a run) and its median subtracted -- so variant selection
is decided by device time, not tunnel noise. The headline number is the
best EXACT variant (dense or fused attention; both use exact NSM
neighborhoods and f32 activations). The approximate-knn variant (recall
0.95) is reported alongside, never as headline; further opt-in variants
(bf16 activation chains) are documented in STATUS.md rather than
measured here, to keep the run inside the driver's time budget.

MFU: FLOPs come from XLA's own cost model (compiled.cost_analysis()) of the
headline executable, divided by measured device time and the chip's bf16
peak.

Baseline: the reference paper reports ~0.09 s per pair model time on GPU
(BASELINE.md "Per-pair model time"). vs_baseline = baseline / ours, so > 1
means faster than the reference.

Besides the flagship N=5120 line the bench emits one JSON line per
additional regime so the driver-captured record can show regressions
beyond the flagship:
  - pointdsc_e2e_pair_time_n12k  (KITTI eval size)
  - pointdsc_e2e_pair_time_n20k  (Redwood multiway size)
  - pointdsc_train_step_bs16_n1000 (fused-attention training step)
Round-5 methodology (VERDICT r4 item 1): these three lines loop ON DEVICE
(lax.fori_loop, one dispatch covers all iterations) with 5 reps, per-rep
spreads, and a double-length differencing cross-check that cancels the
tunnel RTT exactly — see _loop_measure. The large-N lines report the
EXACT pipeline as the headline value with the approx-knn variant
alongside (same policy as the flagship). The FLAGSHIP line is printed
LAST. Set BENCH_FLAGSHIP_ONLY=1 to skip the extra regimes (keeps the run
short for interactive use).
"""

import json
import os
import time

import numpy as np

N_CORR = 5120  # bucket for the 3DMatch 'all' (~5k) regime
NUM_LAYERS = 12
NUM_CHANNELS = 128
# 32 pairs per dispatch: the tunnel RTT varies by several ms between runs,
# so the subtraction error per pair is rtt_variance / STREAM — 32 keeps it
# under ~0.2 ms
STREAM = 32
BASELINE_SEC_PER_PAIR = 0.09

# bf16 peak TFLOP/s per chip (public specs). NOTE: rounds 1-4 listed v5e at
# 394e12, which is its INT8 peak (TOPS) — the bf16 peak is 197e12 (the same
# number the kernel roofline analysis in kernels/encoder_layer.py always
# used). Every other row here is a bf16 figure, so historical v5e MFU
# records (e.g. BENCH_r04's 19.54%) understate real MFU by exactly 2x.
_PEAKS = {"v4": 275e12, "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
          "v6 lite": 918e12, "v6e": 918e12}


def fetch(x):
    """Force full materialization on the host. On tunneled/async backends
    `block_until_ready` can return before execution finishes; a host fetch
    of the result cannot."""
    return np.asarray(x)


_RTT_STATE = {}


def measure_rtt():
    """Round-trip + dispatch overhead baseline: fetch of a trivial program.

    The tunnel RTT drifts by several ms over a run, so callers re-measure
    it interleaved with their timed reps rather than once up front."""
    import jax
    import jax.numpy as jnp

    if "fn" not in _RTT_STATE:
        tiny = jnp.zeros((4,))

        @jax.jit
        def trivial(x):
            return x + 1.0

        fetch(trivial(tiny))
        _RTT_STATE["fn"] = trivial
        _RTT_STATE["arg"] = tiny
    trivial, tiny = _RTT_STATE["fn"], _RTT_STATE["arg"]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(trivial(tiny))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chip_peak_flops(device_str: str) -> float | None:
    s = device_str.lower()
    for key, peak in _PEAKS.items():
        if key in s:
            return peak
    return None


def _loop_measure(run, args, iters=16, iters_short=4, reps=5):
    """Time a jitted on-device loop `run(*args, iters)` (dynamic trip
    count, so ONE compile serves both lengths). Returns per-iteration
    medians + spreads by two independent estimators:
      - rtt_sub: (wall(iters) - interleaved RTT median) / iters
      - diff:    (median wall(iters) - median wall(iters_short))
                 / (iters - iters_short)  -- cancels the RTT and any fixed
                 dispatch cost entirely; pure device time per iteration.
    Round-5 methodology (VERDICT r4 item 1): the round-4 scheme chained
    PYTHON dispatches, which stalls when the tunnel throttles dispatch
    streaming (observed: identical code, 6.7 vs 12.7 ms on the same chip
    35 min apart). The loop now lives ON DEVICE (lax.fori_loop), so one
    dispatch covers all iterations and the tunnel can only shift the
    constant term, which both estimators remove."""
    long_w, short_w, per_rtt = [], [], []
    for _ in range(reps):
        r = measure_rtt()
        t0 = time.perf_counter()
        fetch(run(*args, iters))
        long_w.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fetch(run(*args, iters_short))
        short_w.append(time.perf_counter() - t0)
        per_rtt.append(r)
    rtt_sub = [max(w - r, 0.0) / iters for w, r in zip(long_w, per_rtt)]
    diff = (float(np.median(long_w)) - float(np.median(short_w))) / (
        iters - iters_short
    )
    return {
        "per_iter": float(np.median(rtt_sub)),
        "spread": rtt_sub,
        "device_diff": max(diff, 0.0),
    }


def bench_large_n(n_corr=12288, iters=16, production=False):
    """Per-pair fused inference at KITTI/Redwood eval sizes, measured with
    an ON-DEVICE lax.fori_loop cycling 4 resident pairs (see _loop_measure
    for why: python-dispatch chains are tunnel-sensitive). Both the EXACT
    pipeline (fused seed-kNN kernel + exact NMS) and the approx_knn variant
    (recall 0.95) are measured; the headline is the exact one, per the
    flagship policy above. Mirrors tools/bench_large_n.py.

    production=True measures the KITTI production configuration instead
    (exact variant only): trained synthetic-KITTI release weights, 50 m
    scenes, tau=0.6 / sigma_d=1.2 (the overrides the reference applies at
    evaluation/test_KITTI.py:166-170). This is the regime where confidence
    logits are informative, so the NMS prefilter certificate passes and
    the data-dependent fast paths run as a real KITTI eval would; the
    default (init-weights) lines keep cross-round continuity and measure
    the certificate-fallback worst case."""
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC

    ds_kw = dict(scene_scale=50.0, noise=0.05) if production else {}
    ds = SyntheticPairDataset(num_pairs=4, num_corr=n_corr, inlier_ratio=0.3,
                              seed=3, **ds_kw)
    stack = tuple(
        jnp.asarray(np.stack([ds[i][key] for i in range(4)]))
        for key in ("corr_pos", "src_keypts", "tgt_keypts")
    )
    s0 = SyntheticPairDataset(num_pairs=1, num_corr=1024, seed=0)[0]

    model_kw = (
        dict(inlier_threshold=0.6, sigma_d=1.2, nms_radius=1.2)
        if production else {}
    )
    variants = (("exact", False),) if production else (
        ("exact", False), ("approx", True))
    results = {}
    for name, approx in variants:
        model = PointDSC(
            in_dim=6, num_layers=NUM_LAYERS, num_channels=NUM_CHANNELS, k=40,
            ratio=0.1, approx_knn=approx, **model_kw,
        )
        example = (
            jnp.asarray(s0["corr_pos"])[None],
            jnp.asarray(s0["src_keypts"])[None],
            jnp.asarray(s0["tgt_keypts"])[None],
        )
        if production:
            from pointdsc_tpu.train.trainer import load_model_weights

            ckpt = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "snapshot/PointDSC_SyntheticKITTI_release/models/model_best.pkl",
            )
            variables = load_model_weights(model, ckpt, example)
        else:
            variables = model.init(jax.random.key(0), *example)

        @jax.jit
        def run(cp, s, t, n_iters, model=model, variables=variables):
            def body(i, c):
                b = i % 4
                out = model.apply(
                    variables,
                    jax.lax.dynamic_index_in_dim(cp, b) + 0.0 * c,
                    jax.lax.dynamic_index_in_dim(s, b),
                    jax.lax.dynamic_index_in_dim(t, b),
                    testing=True, fused_attention=True,
                )
                return out.final_trans[0, 0, 0]

            return jax.lax.fori_loop(0, n_iters, body, jnp.asarray(0.0))

        fetch(run(*stack, iters))  # compile
        results[name] = _loop_measure(run, stack, iters=iters)
    return results


def bench_train_step(iters=16, reps=5):
    """Fused-attention training step at the reference shape (bs=16, N=1000):
    forward + 3 losses + backward + guarded Adam, one jitted program.

    Round-5 methodology fix (VERDICT r4 item 1): steps loop ON DEVICE via
    lax.fori_loop, alternating 2 resident batches, with the state carried
    through the loop — see _loop_measure. The returned scalar depends on
    every param leaf so the loop cannot be dead-code-eliminated. The
    round-4 python-dispatch chain measured 13.17 ms for a step whose pure
    device time is ~11 ms; the difference was tunnel dispatch-streaming
    overhead, which this scheme removes."""
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data import SyntheticPairDataset, collate_batch
    from pointdsc_tpu.train.config import get_config
    from pointdsc_tpu.train.trainer import Trainer

    cfg = get_config("3DMatch", ["--fused_attention", "true"])
    cfg.verbose = False
    cfg.tboard_dir = ""
    bs = cfg.batch_size
    trainer = Trainer(cfg)
    ds = SyntheticPairDataset(num_pairs=bs * 3, num_corr=cfg.num_node, seed=0)
    batches = [
        jax.tree_util.tree_map(
            jnp.asarray, collate_batch([ds[i * bs + j] for j in range(bs)])
        )
        for i in range(3)
    ]
    state = trainer.init_state(batches[0], steps_per_epoch=100)
    trainer.build_steps()
    ep = jnp.asarray(1)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), batches[1], batches[2]
    )

    @jax.jit
    def run(st, stacked, n_iters):
        def body(i, st):
            b = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i % 2, keepdims=False),
                stacked,
            )
            st2, _ = trainer._train_step(st, b, ep)
            return st2

        out = jax.lax.fori_loop(0, n_iters, body, st)
        # depend on every param leaf so nothing is dead-code-eliminated
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out.params))

    fetch(run(state, stacked, iters))  # compile
    r = _loop_measure(run, (state, stacked), iters=iters, reps=reps)
    return r, bs


def main():
    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.data.synthetic import SyntheticPairDataset
    from pointdsc_tpu.models.pointdsc import PointDSC

    model = PointDSC(
        in_dim=6,
        num_layers=NUM_LAYERS,
        num_channels=NUM_CHANNELS,
        k=40,
        ratio=0.1,
        inlier_threshold=0.10,
        sigma_d=0.10,
        nms_radius=0.10,
    )
    ds = SyntheticPairDataset(
        num_pairs=STREAM, num_corr=N_CORR, inlier_ratio=0.3, seed=7
    )
    samples = [ds[i] for i in range(STREAM)]
    stream = tuple(
        jnp.asarray(np.stack([s[key] for s in samples]))
        for key in ("corr_pos", "src_keypts", "tgt_keypts")
    )
    single = tuple(x[:1] for x in stream)

    variables = model.init(jax.random.key(0), *single)
    on_tpu = jax.default_backend() == "tpu"
    model_approx = model.clone(approx_knn=True)

    rtt = measure_rtt()

    def stream_fn(m, fused):
        @jax.jit
        def run(corr_pos, src, tgt):
            def one(args):
                cp, s, t = args
                out = m.apply(
                    variables, cp[None], s[None], t[None],
                    testing=True, fused_attention=fused,
                )
                return out.final_trans[0]

            return jax.lax.map(one, (corr_pos, src, tgt))

        return run

    def measure_stream(m, fused):
        run = stream_fn(m, fused)
        fetch(run(*stream))  # compile + warm
        times, rtts = [], []
        for _ in range(5):
            rtts.append(measure_rtt())  # interleaved: tracks tunnel drift
            t0 = time.perf_counter()
            fetch(run(*stream))
            times.append(time.perf_counter() - t0)
        return (
            max(float(np.median(times)) - float(np.median(rtts)), 1e-9)
            / STREAM
        )

    # bf16-activation-chain and other opt-in variants are documented in
    # STATUS.md; the bench keeps to ~3 heavy compiles so the whole run
    # stays inside the driver's time budget. On TPU the dense path is
    # measured via the single-dispatch program only (it has lost to the
    # fused path by >2x every round; its stream compile slot now funds the
    # large-N and train-step regime lines instead).
    if on_tpu:
        variants = {"fused": (model, True), "fused_approx": (model_approx, True)}
    else:
        variants = {"dense": (model, False)}

    per_pair = {name: measure_stream(m, f) for name, (m, f) in variants.items()}

    exact_names = [n for n in per_pair if n != "fused_approx"]
    variant = min(exact_names, key=lambda n: per_pair[n])
    headline = per_pair[variant]

    # One dense single-pair executable serves two purposes: XLA's FLOP
    # count for MFU (custom Pallas kernels report no flops to the cost
    # model, so the fused executable undercounts; flash-attention
    # convention is to rate fused kernels by dense-equivalent work) and
    # the bs=1 single-dispatch latency measurement.
    @jax.jit
    def fwd_dense_ref(corr_pos, src, tgt):
        out = model.apply(variables, corr_pos, src, tgt, testing=True)
        return out.final_trans

    flops = mfu = achieved_tflops = None
    try:
        cost = fwd_dense_ref.lower(*single).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        flops = None

    fetch(fwd_dense_ref(*single))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(fwd_dense_ref(*single))
        ts.append(time.perf_counter() - t0)
    p50_single = float(np.median(ts))
    device = str(jax.devices()[0])
    peak = chip_peak_flops(device)
    if flops and peak:
        achieved_tflops = flops / headline / 1e12
        mfu = flops / headline / peak

    # ---- additional regime lines (before the flagship so the driver's
    # last-line parse still lands on the headline metric)
    if on_tpu and not os.environ.get("BENCH_FLAGSHIP_ONLY"):
        for n_corr, metric, note in (
            (12288, "pointdsc_e2e_pair_time_n12k",
             "KITTI eval size; on-device fori_loop timing"),
            (20480, "pointdsc_e2e_pair_time_n20k",
             "Redwood multiway size (ref test_multi_ate.py:245 uses "
             "N=20000); on-device fori_loop timing"),
        ):
            try:
                r = bench_large_n(n_corr)
                ex, ap = r["exact"], r["approx"]
                print(json.dumps({
                    "metric": metric,
                    "value": round(ex["per_iter"] * 1000, 3),
                    "unit": "ms",
                    "vs_baseline": None,  # the reference publishes no time here
                    "variant": "fused_exact",
                    "rep_spread_ms": [
                        round(t * 1000, 2) for t in ex["spread"]
                    ],
                    "device_time_crosscheck_ms": round(
                        ex["device_diff"] * 1000, 3
                    ),
                    "approx_knn_ms": round(ap["per_iter"] * 1000, 3),
                    "approx_rep_spread_ms": [
                        round(t * 1000, 2) for t in ap["spread"]
                    ],
                    "note": note,
                }))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"metric": metric, "error": str(e)[:200]}))
        # production KITTI configuration: trained weights + in-regime data,
        # the setting where the data-dependent fast paths (NMS prefilter
        # certificate, refinement early-exit) behave as a real KITTI eval
        try:
            r = bench_large_n(12288, production=True)
            ex = r["exact"]
            print(json.dumps({
                "metric": "pointdsc_e2e_pair_time_n12k_production",
                "value": round(ex["per_iter"] * 1000, 3),
                "unit": "ms",
                "vs_baseline": None,
                "variant": "fused_exact",
                "weights": "PointDSC_SyntheticKITTI_release",
                "rep_spread_ms": [round(t * 1000, 2) for t in ex["spread"]],
                "device_time_crosscheck_ms": round(
                    ex["device_diff"] * 1000, 3
                ),
                "note": "KITTI production config (trained weights, 50 m "
                        "scenes, tau=0.6/sigma_d=1.2, ref "
                        "test_KITTI.py:166-170); on-device fori_loop",
            }))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "metric": "pointdsc_e2e_pair_time_n12k_production",
                "error": str(e)[:200],
            }))
        try:
            r, bs = bench_train_step()
            tstep = r["per_iter"]
            print(json.dumps({
                "metric": "pointdsc_train_step_bs16_n1000",
                "value": round(tstep * 1000, 3),
                "unit": "ms",
                "vs_baseline": None,  # reference publishes no step time
                "pairs_per_sec_per_chip": round(bs / tstep, 1),
                "variant": "fused_attention",
                "rep_spread_ms": [round(t * 1000, 2) for t in r["spread"]],
                "device_time_crosscheck_ms": round(
                    r["device_diff"] * 1000, 3
                ),
                "note": "on-device fori_loop (16 steps), state carried",
            }))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "metric": "pointdsc_train_step_bs16_n1000", "error": str(e)[:200]
            }))

    print(
        json.dumps(
            {
                "metric": "pointdsc_e2e_pair_time_n5k",
                "value": round(headline * 1000, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_SEC_PER_PAIR / headline, 3),
                "pairs_per_sec_per_chip": round(1.0 / headline, 2),
                "variant": variant,
                "stream_ms": {
                    name: round(v * 1000, 3) for name, v in per_pair.items()
                },
                "single_dispatch_dense_p50_ms": round(p50_single * 1000, 3),
                "rtt_ms": round(rtt * 1000, 3),
                "flops_per_pair": flops,
                "achieved_tflops": (
                    round(achieved_tflops, 2) if achieved_tflops else None
                ),
                "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
                "device": device,
            }
        )
    )


if __name__ == "__main__":
    main()
