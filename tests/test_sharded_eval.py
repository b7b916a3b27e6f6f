"""Sharded evaluation over the 8-device CPU mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from pointdsc_tpu.data.synthetic import SyntheticPairDataset
from pointdsc_tpu.eval.runner import Evaluator
from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.parallel.mesh import make_mesh


def test_sharded_matches_sequential(rng):
    assert jax.device_count() == 8
    model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=16, ratio=0.2)
    ds = SyntheticPairDataset(num_pairs=10, num_corr=256, inlier_ratio=0.6, seed=5)
    s = ds[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s["corr_pos"])[None],
        jnp.asarray(s["src_keypts"])[None],
        jnp.asarray(s["tgt_keypts"])[None],
    )
    ev = Evaluator(model, variables)
    stats_seq, agg_seq = ev.run_dataset(ds, verbose=False)
    stats_sh, agg_sh = ev.run_dataset_sharded(ds, mesh=make_mesh(), verbose=False)
    assert stats_sh.shape[0] == len(ds)
    # success flags and RE/TE must agree between paths
    np.testing.assert_array_equal(stats_sh[:, 0], stats_seq[:, 0])
    np.testing.assert_allclose(stats_sh[:, 1], stats_seq[:, 1], atol=1e-3)
    assert agg_sh["pair_recall"] == agg_seq["pair_recall"]
