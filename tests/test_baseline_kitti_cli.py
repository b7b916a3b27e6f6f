"""baseline_scripts/baseline_KITTI.py end-to-end on a generated root."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_kitti_cli_integration import write_fake_kitti


@pytest.mark.slow
def test_baseline_kitti_ransac(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "kitti")
    write_fake_kitti(root, rng, num_pairs=2, n_pts=300)
    monkeypatch.chdir(tmp_path)

    from baseline_scripts.baseline_KITTI import main

    stats, agg = main(
        [
            "--method", "RANSAC", "--root", root, "--num_node", "256",
            "--max_iteration", "512", "--save_npy", "false",
        ]
    )
    assert stats.shape == (2, 12)
    # fake pairs share descriptors -> near-perfect correspondences; RANSAC
    # with the 0.6 m outdoor threshold must register them
    assert agg["pair_recall"] == 100.0


@pytest.mark.slow
def test_baseline_kitti_sm(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "kitti")
    write_fake_kitti(root, rng, num_pairs=2, n_pts=300)
    monkeypatch.chdir(tmp_path)

    from baseline_scripts.baseline_KITTI import main

    stats, agg = main(
        ["--method", "SM", "--root", root, "--num_node", "256",
         "--save_npy", "false"]
    )
    assert stats.shape == (2, 12)
    assert agg["pair_recall"] == 100.0


@pytest.mark.slow
def test_baseline_3dmatch_ransac_shared_runner(tmp_path, rng, monkeypatch):
    """The 3DMatch baseline CLI through the shared runner on a fake root."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from tests.test_eval_cli_integration import write_fake_root

    root = str(tmp_path / "threedmatch")
    write_fake_root(root, rng, num_frag=3, n_pts=300)
    monkeypatch.chdir(tmp_path)

    from baseline_scripts.baseline_3DMatch import main

    # the fake root's raw NN matches run ~13% inliers, so RANSAC needs its
    # full hypothesis budget for a reliable all-inlier draw
    stats, agg = main(
        ["--method", "RANSAC", "--root", root, "--num_node", "256",
         "--max_iteration", "4096", "--save_npy", "True"]
    )
    assert stats.shape[1] == 12
    assert agg["pair_recall"] >= 2 / 3 * 100 - 1e-6
    # the capitalized --save_npy True must work (case-insensitive str2bool)
    assert os.path.exists(tmp_path / "logs" / "baseline-RANSAC-fcgf.npy")


@pytest.mark.slow
def test_baseline_3dmatch_gcransac_exact_minimizer(tmp_path, rng, monkeypatch):
    """--gc_minimizer exact routes GCRANSAC through the native s-t mincut
    (native/maxflow.cpp) end-to-end through the CLI."""
    from tests.test_eval_cli_integration import write_fake_root

    root = str(tmp_path / "threedmatch")
    write_fake_root(root, rng, num_frag=3, n_pts=300)
    monkeypatch.chdir(tmp_path)

    from baseline_scripts.baseline_3DMatch import main

    stats, agg = main(
        ["--method", "GCRANSAC", "--root", root, "--num_node", "256",
         "--max_iteration", "4096", "--gc_minimizer", "exact",
         "--save_npy", "false"]
    )
    assert stats.shape[1] == 12
    # the fake root's ~6% inlier ratio makes the (shared) hypothesis sweep
    # itself marginal at 4096 draws — both minimizers fail the same pairs
    # when no all-inlier triplet is drawn, so this test asserts the exact
    # path's CLI plumbing, not labeling quality (that's
    # test_baselines.py::TestCoherenceMincut on planted data)
    assert agg["pair_recall"] >= 1 / 3 * 100 - 1e-6
