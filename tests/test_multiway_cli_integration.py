"""Multiway CLI end-to-end on a generated Redwood-format scene root."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointdsc_tpu.data import transforms_np as T

SCENE = "livingroom1-simulated"


def write_fake_redwood(root, rng, num_frag=4, n_pts=500):
    world = rng.uniform(-2, 2, (4000, 3))
    world_desc = rng.normal(size=(4000, 24))
    world_desc /= np.linalg.norm(world_desc, axis=-1, keepdims=True)

    poses = [np.eye(4)]
    for _ in range(num_frag - 1):
        poses.append(
            poses[-1] @ T.integrate_trans(
                T.rotation_matrix(3, 0.03, rng), T.translation_matrix(0.3, rng)
            )
        )

    frag_dir = os.path.join(root, SCENE, "fragments")
    os.makedirs(frag_dir, exist_ok=True)
    for i, pose in enumerate(poses):
        sel = rng.choice(4000, n_pts, replace=False)
        local = T.transform(world[sel], np.linalg.inv(pose))
        local += rng.normal(size=local.shape) * 0.002
        np.savez(
            os.path.join(frag_dir, f"fragment_{i:03d}_fpfh.npz"),
            xyz=local.astype(np.float32),
            feature=world_desc[sel].astype(np.float32),
        )
        np.save(os.path.join(frag_dir, f"fragment_{i:03d}.npy"), pose)
    return poses


@pytest.mark.slow
def test_multiway_cli_end_to_end(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "redwood")
    write_fake_redwood(root, rng)

    monkeypatch.chdir(tmp_path)
    from multiway.test_multi_ate import main

    ates = main([
        "--root", root,
        "--scenes", SCENE,
        "--num_node", "400",
    ])
    assert len(ates) == 1
    # near-perfect correspondences (shared latents) + odometry ICP must give
    # a globally consistent trajectory
    assert ates[0] < 10.0, f"ATE {ates[0]} cm"
