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


def test_multiway_cli_regime_guard_flips_for_imported_weights(
    tmp_path, rng, monkeypatch, capsys
):
    """VERDICT r4 item 3: the multiway CLI used to jit model.apply with the
    model-default offset_softmax=True and NO regime check, so imported
    weights silently degraded toward uniform attention at N=20k. Drive the
    CLI on a fake root with an inflated-norm checkpoint (the
    tests/test_offset_regime.py adversary) and require the running-max
    fallback to be selected."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from pointdsc_tpu.models.pointdsc import PointDSC
    from pointdsc_tpu.train.config import default_config
    from tests.test_offset_regime import _inflate_keys

    root = str(tmp_path / "redwood")
    write_fake_redwood(root, rng, num_frag=3, n_pts=300)

    # snapshot with inflated-key weights in the CLI's on-disk format
    cfg = default_config("3DMatch")
    cfg.num_layers = 3
    cfg.num_node = 256
    snap = tmp_path / "snapshot" / "badsnap"
    (snap / "models").mkdir(parents=True)
    cfg.save(str(snap / "config.json"))
    model = PointDSC(
        in_dim=cfg.in_dim, num_layers=cfg.num_layers,
        num_channels=cfg.num_channels, num_iterations=cfg.num_iterations,
        ratio=cfg.ratio, sigma_d=cfg.sigma_d, k=cfg.k,
        inlier_threshold=cfg.inlier_threshold,
        nms_radius=cfg.inlier_threshold,
    )
    dummy = jnp.zeros((1, 256, 3), jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 256, 6), jnp.float32), dummy, dummy
    )
    bad = _inflate_keys(variables, 100.0)
    with open(snap / "models" / "model_best.pkl", "wb") as f:
        f.write(serialization.to_bytes(
            {"params": bad["params"], "batch_stats": bad["batch_stats"]}
        ))

    monkeypatch.chdir(tmp_path)
    from multiway.test_multi_ate import main

    ates = main([
        "--root", root,
        "--scenes", SCENE,
        "--num_node", "256",
        "--chosen_snapshot", "badsnap",
        "--fused", "true",
    ])
    out = capsys.readouterr().out
    assert "running-max flash" in out, out
    assert len(ates) == 1 and np.isfinite(ates[0])
