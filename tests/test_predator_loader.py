"""Predator .pth loader: fake file round-trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pointdsc_tpu.data.predator import load_predator_pair
from pointdsc_tpu.data import transforms_np as T


def test_load_predator_pair(tmp_path, rng):
    n_src, n_tgt = 300, 280
    src = rng.uniform(-1, 1, (n_src, 3)).astype(np.float32)
    R = T.rotation_matrix(3, 1.0, rng)
    t = T.translation_matrix(0.3, rng)
    gt = T.integrate_trans(R, t)
    # tgt = warped src points (subset) + extras
    tgt = T.transform(src.astype(np.float64), gt).astype(np.float32)[:n_tgt]
    feats = rng.normal(size=(n_src, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    payload = {
        "len_src": n_src,
        "pcd": torch.from_numpy(np.concatenate([src, tgt])),
        "feats": torch.from_numpy(np.concatenate([feats, feats[:n_tgt]])),
        "saliency": torch.from_numpy(np.ones(n_src + n_tgt, np.float32)),
        "overlaps": torch.from_numpy(np.ones(n_src + n_tgt, np.float32)),
        "rot": torch.from_numpy(R),
        "trans": torch.from_numpy(t.reshape(3, 1)),
    }
    path = str(tmp_path / "0.pth")
    torch.save(payload, path)

    sample = load_predator_pair(path, n_points=200, rng=rng)
    assert sample["corr_pos"].shape == (200, 6)
    assert sample["src_keypts"].shape == (200, 3)
    # identical descriptors -> matched pairs are true inliers for src<n_tgt
    assert sample["gt_labels"].mean() > 0.5
    np.testing.assert_allclose(sample["gt_trans"], gt, atol=1e-6)
