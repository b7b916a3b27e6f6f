"""multiway/make_fragments.py CLI end-to-end on a synthetic depth scene."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointdsc_tpu.data import transforms_np as T
from tests.test_fusion import INTR, render_plane_depth


def _write_scene(scene_dir, n_frames=4):
    from PIL import Image

    os.makedirs(os.path.join(scene_dir, "depth"), exist_ok=True)
    for i in range(n_frames):
        pose = T.integrate_trans(np.eye(3), np.array([0.02 * i, 0.0, 0.0]))
        depth = np.asarray(render_plane_depth(INTR, pose))
        mm = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(mm).save(
            os.path.join(scene_dir, "depth", f"{i:06d}.png")
        )


@pytest.mark.slow
def test_make_fragments_cli(tmp_path):
    scene = str(tmp_path / "scene1")
    _write_scene(scene)
    intr_path = str(tmp_path / "intr.json")
    with open(intr_path, "w") as f:
        json.dump(
            {
                "width": INTR.width, "height": INTR.height, "fx": INTR.fx,
                "fy": INTR.fy, "cx": INTR.cx, "cy": INTR.cy,
            },
            f,
        )
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(
            {
                "path_dataset": scene,
                "n_frames_per_fragment": 4,
                "path_intrinsic": intr_path,
            },
            f,
        )

    from multiway.make_fragments import main

    out = main(["--config", cfg_path, "--voxel_size", "0.02",
                "--fpfh_voxel", "0.05"])
    assert os.path.exists(os.path.join(out, "fragment_000.ply"))
    assert os.path.exists(os.path.join(out, "fragment_000.npy"))
    npz = np.load(os.path.join(out, "fragment_000_fpfh.npz"))
    assert npz["xyz"].shape[0] > 50
    assert npz["feature"].shape == (npz["xyz"].shape[0], 33)
