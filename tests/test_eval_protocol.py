"""Eval protocol: stats rows, aggregation, and the Evaluator loop."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointdsc_tpu.data.synthetic import SyntheticPairDataset
from pointdsc_tpu.eval.protocol import aggregate_stats, pair_stats, format_scene_report
from pointdsc_tpu.eval.runner import Evaluator
from pointdsc_tpu.models import PointDSC


class TestPairStats:
    def test_perfect_pair(self):
        gt = np.eye(4)
        labels = np.array([1.0, 1.0, 0.0, 0.0])
        row = pair_stats(gt, labels, gt, labels, 15.0, 30.0, 0.01, 0.002, 3)
        assert row[0] == 1.0  # success
        assert row[1] < 1e-6 and row[2] < 1e-6
        assert row[3] == 2.0 and row[4] == 0.5
        assert row[6] == 1.0 and row[7] == 1.0 and row[8] == 1.0
        assert row[11] == 3.0

    def test_failure_pair(self):
        gt = np.eye(4)
        bad = np.eye(4)
        bad[:3, 3] = [1.0, 0, 0]  # 100 cm off
        labels = np.ones(4)
        row = pair_stats(bad, labels, gt, labels, 15.0, 30.0, 0.0, 0.0, 0)
        assert row[0] == 0.0
        assert abs(row[2] - 100.0) < 1e-6

    def test_aggregation_re_te_over_successes_only(self):
        rows = np.zeros((4, 12))
        rows[:, 0] = [1, 1, 0, 0]
        rows[:, 1] = [1.0, 3.0, 90.0, 90.0]
        rows[:, 2] = [10.0, 20.0, 500.0, 500.0]
        rows[:, 11] = [0, 0, 1, 1]
        agg = aggregate_stats(rows, ["sceneA", "sceneB"])
        assert agg["pair_recall"] == 50.0
        assert agg["re"] == 2.0  # mean over successes only
        assert agg["te"] == 15.0
        assert agg["scenes"][0]["recall"] == 100.0
        assert agg["scenes"][1]["recall"] == 0.0
        report = format_scene_report(agg)
        assert "Reg Recall=50.00%" in report


class TestEvaluator:
    @pytest.mark.slow
    def test_synthetic_dataset_recall(self):
        """Untrained model + geometric pipeline on easy synthetic pairs must
        reach high recall (spatial consistency carries it)."""
        model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=20, ratio=0.2)
        ds = SyntheticPairDataset(
            num_pairs=6, num_corr=256, inlier_ratio=0.5, seed=3, vary_n=True
        )
        s = ds[0]
        variables = model.init(
            jax.random.key(0),
            jnp.asarray(s["corr_pos"])[None],
            jnp.asarray(s["src_keypts"])[None],
            jnp.asarray(s["tgt_keypts"])[None],
        )
        ev = Evaluator(model, variables)
        stats, agg = ev.run_dataset(ds, scene_of=lambda i: i % 2, verbose=False)
        assert stats.shape == (6, 12)
        assert agg["pair_recall"] >= 80.0
        assert agg["model_time"] > 0
