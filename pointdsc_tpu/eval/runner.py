"""Generic pair-wise evaluation loop (the engine behind test_3DMatch etc.).

Replaces the per-scene eval loops of /root/reference/evaluation/
test_3DMatch.py:20-137. Each pair is padded to a shape bucket and run through
a jitted testing-mode forward; one compilation per bucket, then every pair at
that size reuses the executable. Model time is measured with
`block_until_ready` so it reflects device execution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pointdsc_tpu.data.pipeline import pad_to_bucket
from pointdsc_tpu.eval.protocol import aggregate_stats, pair_stats
from pointdsc_tpu.models.pointdsc import PointDSC
from pointdsc_tpu.utils.timer import Timer


class Evaluator:
    def __init__(
        self,
        model: PointDSC,
        variables: dict,
        re_thre=15.0,
        te_thre=30.0,
        use_icp: bool = False,
        icp_threshold: float = 0.10,
        fused_attention: bool = False,
        solver: str = "SVD",
        sp_mesh=None,
    ):
        """solver='SVD' uses the model transform; solver='RANSAC' re-solves
        on the model-prefiltered inliers with the on-device RANSAC
        (reference test_3DMatch.py:59-77 runs Open3D RANSAC there).

        sp_mesh: optional jax.sharding.Mesh with an 'sp' axis — the encoder
        of every pair runs sequence-parallel over it (row-sharded N² stage,
        parallel/seq_parallel.py; the fused sharded encoder when
        fused_attention, the dense-semantics one otherwise). For pairs whose
        correspondence count outgrows one chip's HBM; bucket sizes must
        divide the mesh axis (they are powers of two, so any power-of-two
        device count works)."""
        self.model = model
        self.variables = variables
        self.re_thre = re_thre
        self.te_thre = te_thre
        self._use_icp = use_icp
        self._icp_threshold = icp_threshold
        self._fused_attention = fused_attention
        self._solver = solver
        self._sp_mesh = sp_mesh
        # the offset-softmax bound slack is pair-dependent, so the guard
        # probes the first few pairs (not just the first — VERDICT r4
        # item 7) in addition to the first pair of every shape bucket
        self._regime_probes_left = 3
        self._build_forward()
        self._warmed_buckets: set[int] = set()

    def _build_forward(self):
        model, variables = self.model, self.variables
        fused_attention, solver = self._fused_attention, self._solver
        use_icp, icp_threshold = self._use_icp, self._icp_threshold
        sp_mesh = self._sp_mesh

        @jax.jit
        def _forward(corr_pos, src_keypts, tgt_keypts, mask):
            features = None
            if sp_mesh is not None:
                from pointdsc_tpu.parallel.seq_parallel import (
                    sp_encode,
                    sp_encode_fused,
                )

                encode = sp_encode_fused if fused_attention else sp_encode
                features = encode(
                    model, variables, corr_pos, src_keypts, tgt_keypts,
                    sp_mesh, mask=mask,
                )
            out = model.apply(
                variables, corr_pos, src_keypts, tgt_keypts, mask=mask,
                testing=True, fused_attention=fused_attention,
                precomputed_features=features,
            )
            trans = out.final_trans
            if solver == "RANSAC":
                from pointdsc_tpu.baselines.classical import ransac_registration

                inlier_mask = (out.final_labels > 0) & mask
                trans, _ = ransac_registration(
                    src_keypts, tgt_keypts, jax.random.key(51),
                    inlier_threshold=icp_threshold, num_hypotheses=4096,
                    mask=inlier_mask,
                )
            if use_icp:
                # ICP polish on the correspondence keypoint clouds
                # (reference icp_refine, benchmark_utils.py:40-56), fused
                # into the same XLA program; vmapped so it stays correct for
                # any batch size, not just bs=1
                from pointdsc_tpu.ops.icp import icp_point_to_point

                def one(s, t, tr, m):
                    tr2, _, _ = icp_point_to_point(
                        s, t, tr, max_correspondence_distance=icp_threshold,
                        src_mask=m, tgt_mask=m,
                    )
                    return tr2

                trans = jax.vmap(one)(src_keypts, tgt_keypts, trans, mask)
            return trans, out.final_labels

        self._forward = _forward

    def _guard_offset_regime(self, args):
        """Checkpoint-load-time kernel selection (models/regime.py::
        select_attention_kernels): the offset-softmax eval kernels are
        exact only while the bound slack stays inside the regime; weights
        imported from elsewhere carry no such guarantee and would
        otherwise degrade SILENTLY toward uniform attention. The slack is
        also pair-dependent, so the guard probes the first few pairs of
        the run AND the first pair of every shape bucket (a single-pair
        probe plus the 20-nat margin could miss a heterogeneous scene —
        VERDICT r4 item 7); out of regime flips the model to the
        running-max flash kernels (exact for arbitrary weights) before
        any timed dispatch."""
        if not self._fused_attention or not self.model.offset_softmax:
            self._regime_probes_left = 0
            return False
        from pointdsc_tpu.models.regime import select_attention_kernels

        self._regime_probes_left = max(self._regime_probes_left - 1, 0)
        corr_pos, src, tgt, mask = args
        self.model, _, flipped = select_attention_kernels(
            self.model, self.variables, corr_pos, src, tgt, mask=mask,
            context="eval",
        )
        if flipped:
            self._regime_probes_left = 0  # running-max kernels are exact
            self._build_forward()
            if hasattr(self, "_forward_batch_fn"):
                del self._forward_batch_fn
            # buckets were warmed against the old executables
            self._warmed_buckets.clear()
        return flipped

    def run_pair(self, sample: dict, scene_ind: int = 0, data_time: float = 0.0):
        """sample: un-padded dict from a dataset; returns a 12-col stats row."""
        n = sample["corr_pos"].shape[0]
        padded = pad_to_bucket(sample)
        args = (
            jnp.asarray(padded["corr_pos"])[None],
            jnp.asarray(padded["src_keypts"])[None],
            jnp.asarray(padded["tgt_keypts"])[None],
            jnp.asarray(padded["mask"])[None],
        )

        # one discarded warmup per shape bucket so model_time never includes
        # XLA compilation (the first pair of a bucket would otherwise report
        # tens of seconds)
        bucket = padded["corr_pos"].shape[0]
        if self._regime_probes_left > 0 or bucket not in self._warmed_buckets:
            self._guard_offset_regime(args)
        if bucket not in self._warmed_buckets:
            # a host fetch is the only reliable sync on tunneled backends
            np.asarray(self._forward(*args)[0])
            self._warmed_buckets.add(bucket)

        t = Timer()
        t.tic()
        trans, labels = self._forward(*args)
        # the host fetch is the only reliable sync point on tunneled/async
        # backends, so model_time is measured around it
        trans = np.asarray(trans)[0]
        labels = np.asarray(labels)[0][:n]
        model_time = t.toc(average=False)
        return (
            pair_stats(
                trans,
                labels,
                sample["gt_trans"],
                sample["gt_labels"],
                self.re_thre,
                self.te_thre,
                model_time,
                data_time,
                scene_ind,
            ),
            trans,
        )

    def run_dataset(self, dataset, scene_of=None, verbose=True):
        """Evaluate every pair; `scene_of(i)` maps index -> scene id."""
        rows = []
        timer = Timer()
        for i in range(len(dataset)):
            timer.tic()
            sample = dataset[i]
            data_time = timer.toc(average=False)
            scene = scene_of(i) if scene_of else 0
            row, _ = self.run_pair(sample, scene_ind=scene, data_time=data_time)
            rows.append(row)
            if verbose and (i + 1) % 100 == 0:
                print(f"[{i + 1}/{len(dataset)}] pairs evaluated")
        stats = np.stack(rows, axis=0)
        return stats, aggregate_stats(stats)

    # ------------------------------------------------------------------
    def run_dataset_sharded(self, dataset, mesh=None, scene_of=None, verbose=True):
        """Multi-chip eval: fan independent pairs across a data-parallel
        mesh (SURVEY.md section 2 parallelism plan: eval = shard the pair
        list over chips). Pairs are grouped by shape bucket, stacked to
        device-count-sized batches, and each jit dispatch evaluates
        len(mesh) pairs at once.
        """
        from pointdsc_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = mesh or make_mesh()
        n_dev = mesh.devices.size

        rows = [None] * len(dataset)
        warmed: set[int] = set()
        # pairs grouped by shape bucket so each stacked batch shares a compile
        pending: dict[int, list[tuple[int, dict, float]]] = {}

        def flush(bucket, items):
            n_real = len(items)
            while len(items) < n_dev:  # pad the batch with a repeat
                items.append(items[-1])
            batch = {
                key: np.stack([it[1][key] for it in items])
                for key in ("corr_pos", "src_keypts", "tgt_keypts", "mask")
            }
            batch = shard_batch(batch, mesh)
            args = (
                jnp.asarray(batch["corr_pos"]),
                jnp.asarray(batch["src_keypts"]),
                jnp.asarray(batch["tgt_keypts"]),
                jnp.asarray(batch["mask"]),
            )
            # discarded warmup per shape bucket: col 9 is per-pair model
            # time and must not include XLA compilation (mirrors run_pair;
            # separate set — the batched executable is distinct from
            # run_pair's bs=1 one). The regime guard probes the first few
            # flushes too (each probe covers the whole n_dev-pair batch);
            # a flip invalidates warmups done against the old executable.
            if self._regime_probes_left > 0 or bucket not in warmed:
                if self._guard_offset_regime(args):
                    warmed.clear()
            if bucket not in warmed:
                np.asarray(self._forward_batch(*args)[0])
                warmed.add(bucket)
            t = Timer()
            t.tic()
            trans, labels = self._forward_batch(*args)
            trans, labels = np.asarray(trans), np.asarray(labels)
            # col 9 semantics (reference test_3DMatch.py:99-100): per-pair
            # model time. A sharded dispatch evaluates n_real pairs at once,
            # so each pair's share is wall/n_real (padding repeats of a
            # partial final batch are waste charged to the real pairs, not
            # amortized away)
            model_time = t.toc(average=False) / n_real
            for slot, (idx, padded, data_time) in enumerate(items[:n_dev]):
                if rows[idx] is not None:
                    continue
                n = int(padded["mask"].sum())
                rows[idx] = pair_stats(
                    trans[slot],
                    labels[slot][:n],
                    padded["gt_trans"],
                    padded["gt_labels"][:n],
                    self.re_thre,
                    self.te_thre,
                    model_time,
                    data_time,
                    scene_of(idx) if scene_of else 0,
                )

        data_timer = Timer()
        for i in range(len(dataset)):
            data_timer.tic()
            sample = pad_to_bucket(dataset[i])
            data_time = data_timer.toc(average=False)
            bucket = sample["corr_pos"].shape[0]
            pending.setdefault(bucket, []).append((i, sample, data_time))
            if len(pending[bucket]) == n_dev:
                flush(bucket, pending.pop(bucket))
        for bucket, items in pending.items():
            flush(bucket, items)

        stats = np.stack([r for r in rows if r is not None], axis=0)
        agg = aggregate_stats(stats)
        # col 9 in a sharded run is wall/n_real of an n_dev-pair dispatch —
        # a throughput share, not a latency. Pairs execute concurrently on
        # different chips, so a per-pair device latency is not a defined
        # quantity here; declare the semantics in the report instead of
        # letting the column silently read as sequential per-pair time.
        agg["model_time_semantics"] = (
            f"batch-amortized: wall/n over {n_dev}-pair sharded dispatches"
        )
        return stats, agg

    @property
    def _forward_batch(self):
        if not hasattr(self, "_forward_batch_fn"):
            model, variables = self.model, self.variables
            solver, use_icp = self._solver, self._use_icp
            icp_thr, fused = self._icp_threshold, self._fused_attention

            @jax.jit
            def fwd(corr_pos, src, tgt, mask):
                out = model.apply(
                    variables, corr_pos, src, tgt, mask=mask,
                    testing=True, fused_attention=fused,
                )
                trans = out.final_trans
                if solver == "RANSAC":
                    from pointdsc_tpu.baselines.classical import ransac_registration

                    inlier_mask = (out.final_labels > 0) & mask
                    trans, _ = ransac_registration(
                        src, tgt, jax.random.key(51),
                        inlier_threshold=icp_thr, num_hypotheses=4096,
                        mask=inlier_mask,
                    )
                if use_icp:
                    from pointdsc_tpu.ops.icp import icp_point_to_point

                    def one(s, t, tr, m):
                        tr2, _, _ = icp_point_to_point(
                            s, t, tr, max_correspondence_distance=icp_thr,
                            src_mask=m, tgt_mask=m,
                        )
                        return tr2

                    trans = jax.vmap(one)(src, tgt, trans, mask)
                return trans, out.final_labels

            self._forward_batch_fn = fwd
        return self._forward_batch_fn
