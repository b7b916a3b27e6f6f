"""Evaluator solver/ICP variants: both must register synthetic pairs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pointdsc_tpu.data.synthetic import SyntheticPairDataset
from pointdsc_tpu.eval.runner import Evaluator
from pointdsc_tpu.models import PointDSC


@pytest.mark.parametrize("solver,use_icp", [("SVD", False), ("RANSAC", False),
                                            ("SVD", True)])
def test_solver_variants(rng, solver, use_icp):
    model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=16, ratio=0.2)
    ds = SyntheticPairDataset(num_pairs=3, num_corr=256, inlier_ratio=0.6, seed=4)
    s = ds[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s["corr_pos"])[None],
        jnp.asarray(s["src_keypts"])[None],
        jnp.asarray(s["tgt_keypts"])[None],
    )
    ev = Evaluator(model, variables, solver=solver, use_icp=use_icp,
                   icp_threshold=0.10)
    stats, agg = ev.run_dataset(ds, verbose=False)
    assert agg["pair_recall"] == 100.0, (solver, use_icp, agg)
