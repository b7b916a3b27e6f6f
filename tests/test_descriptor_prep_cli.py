"""Batch descriptor-prep CLIs end-to-end on a fake data root.

Validates that tools/cal_fpfh.py / tools/cal_fcgf.py write <name>_{desc}.npz
exactly where the datasets look for them (reference misc/cal_fpfh.py:7-106,
misc/cal_fcgf.py:86-195), closing the raw-fragments -> features bootstrap
loop.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointdsc_tpu.data.ply import write_ply_xyz
from pointdsc_tpu.data.threedmatch import TEST_SCENES, _load_fragment


def make_cloud(rng, n=600):
    # two perpendicular planes + noise: gives FPFH real geometry
    a = np.stack([rng.uniform(0, 1, n // 2), rng.uniform(0, 1, n // 2),
                  np.zeros(n // 2)], -1)
    b = np.stack([np.zeros(n - n // 2), rng.uniform(0, 1, n - n // 2),
                  rng.uniform(0, 1, n - n // 2)], -1)
    return np.concatenate([a, b]) + rng.normal(size=(n, 3)) * 0.002


@pytest.mark.slow
def test_cal_fpfh_3dmatch_train_root(tmp_path, rng):
    from tools.cal_fpfh import main

    root = tmp_path / "3DMatch"
    (root / "threedmatch").mkdir(parents=True)
    for name in ("sceneA_000.npz", "sceneA_001.npz"):
        np.savez(root / "threedmatch" / name, pcd=make_cloud(rng))

    n = main(["--job", "3dmatch", "--root", str(root), "--voxel_size", "0.05"])
    assert n == 2
    # loadable through the dataset's fragment loader
    xyz, feat = _load_fragment(
        str(root / "threedmatch_feat" / "sceneA_000"), "fpfh"
    )
    assert xyz.shape[1] == 3 and feat.shape == (xyz.shape[0], 33)
    assert np.isfinite(feat).all()
    np.testing.assert_allclose(
        np.linalg.norm(feat, axis=1), 1.0, atol=1e-3
    )  # loader L2-normalizes


@pytest.mark.slow
def test_cal_fpfh_and_fcgf_test_scenes(tmp_path, rng):
    from tools.cal_fcgf import main as fcgf_main
    from tools.cal_fpfh import main as fpfh_main

    root = tmp_path / "3DMatch"
    scene = TEST_SCENES[0]
    frag = root / "fragments" / scene
    frag.mkdir(parents=True)
    for i in range(2):
        write_ply_xyz(str(frag / f"cloud_bin_{i}.ply"), make_cloud(rng))

    n = fpfh_main(["--job", "3dmatch_test", "--root", str(root),
                   "--scenes", scene])
    assert n == 2
    xyz, feat = _load_fragment(str(frag / "cloud_bin_0"), "fpfh")
    assert feat.shape[1] == 33

    n = fcgf_main(["--job", "3dmatch_test", "--root", str(root),
                   "--scenes", scene, "--grid_size", "32"])
    assert n == 2
    xyz, feat = _load_fragment(str(frag / "cloud_bin_1"), "fcgf")
    assert feat.shape[1] == 32
    assert np.isfinite(feat).all()
