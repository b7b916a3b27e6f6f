"""KITTI odometry pair/gt builder.

Rebuilds /root/reference/misc/cal_fcgf.py:198-340 (`process_kitti`) without
MinkowskiEngine/Open3D: select frame pairs >= 10 m apart from the odometry
poses, map camera-frame odometry into the velodyne frame with the standard
velo->cam extrinsics, refine the ground truth with our ICP on 5 cm voxelized
clouds (cached like the reference's `icp/*.npy`), extract descriptors (FPFH
backend), and write the per-pair `.npz` files consumed by KITTIDataset
(keys xyz0/xyz1/features0/features1/gt_trans).
"""

from __future__ import annotations

import glob
import os

import numpy as np

# KITTI velodyne -> camera extrinsics (public calibration constants, also
# hard-coded by the reference at cal_fcgf.py:225-231)
_R = np.array(
    [
        7.533745e-03, -9.999714e-01, -6.166020e-04,
        1.480249e-02, 7.280733e-04, -9.998902e-01,
        9.998621e-01, 7.523790e-03, 1.480755e-02,
    ]
).reshape(3, 3)
_T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01]).reshape(3, 1)
VELO2CAM = np.vstack([np.hstack([_R, _T]), [0, 0, 0, 1]]).T  # transposed form


def load_odometry_poses(root: str, drive_id: int) -> np.ndarray:
    """Read poses/XX.txt -> [n, 4, 4] camera poses."""
    path = os.path.join(root, "poses", f"{drive_id:02d}.txt")
    data = np.loadtxt(path).reshape(-1, 3, 4)
    n = data.shape[0]
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :] = data
    return poses


def select_pairs(
    positions: np.ndarray, frame_ids: list[int], min_dist: float = 10.0
) -> list[tuple[int, int]]:
    """Greedy pair selection: from each start frame, the first frame within
    the next 100 whose camera position is >= min_dist away
    (cal_fcgf.py:250-266)."""
    Ts = positions[:, :3, 3]
    pdist = np.sqrt(((Ts[None] - Ts[:, None]) ** 2).sum(-1))
    more_than = pdist > min_dist
    ids = set(frame_ids)
    pairs = []
    curr = frame_ids[0]
    while curr in ids:
        nxt = np.where(more_than[curr][curr:curr + 100])[0]
        if len(nxt) == 0:
            curr += 1
            continue
        nxt = int(nxt[0]) + curr - 1
        if nxt in ids:
            pairs.append((curr, nxt))
            curr = nxt + 1
        else:
            curr += 1
    return pairs


def velodyne_pair_gt(pose0: np.ndarray, pose1: np.ndarray) -> np.ndarray:
    """Initial gt transform between two velodyne frames from camera odometry
    (cal_fcgf.py:295-297): M = (velo2cam @ P0^T @ inv(P1^T) @ inv(velo2cam))^T."""
    return (
        VELO2CAM @ pose0.T @ np.linalg.inv(pose1.T) @ np.linalg.inv(VELO2CAM)
    ).T


def read_velodyne_bin(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]


def process_kitti(
    root: str,
    out_dir: str,
    split: str = "train",
    split_dir: str | None = None,
    min_dist: float = 10.0,
    voxel_size: float = 0.30,
    icp_voxel: float = 0.05,
    descriptor: str = "fpfh",
    drop_pairs=((8, 15, 58),),
):
    """Build the `{descriptor}_{split}` pair directory for KITTIDataset."""
    import jax.numpy as jnp

    from pointdsc_tpu.descriptors import extract_fpfh, voxel_downsample
    from pointdsc_tpu.ops.icp import icp_point_to_point

    split_dir = split_dir or os.path.join(os.path.dirname(__file__), "splits")
    subset = open(os.path.join(split_dir, f"{split}_kitti.txt")).read().split()

    pair_dir = os.path.join(out_dir, f"{descriptor}_{split}")
    icp_dir = os.path.join(out_dir, "icp")
    os.makedirs(pair_dir, exist_ok=True)
    os.makedirs(icp_dir, exist_ok=True)

    for name in subset:
        drive = int(name)
        fnames = glob.glob(
            os.path.join(root, "sequences", f"{drive:02d}", "velodyne", "*.bin")
        )
        frame_ids = sorted(int(os.path.basename(f)[:-4]) for f in fnames)
        poses = load_odometry_poses(root, drive)
        pairs = select_pairs(poses, frame_ids, min_dist)
        pairs = [p for p in pairs if (drive, p[0], p[1]) not in set(drop_pairs)]

        for t0, t1 in pairs:
            key = f"{drive}_{t0}_{t1}"
            out_path = os.path.join(pair_dir, f"pair_{key}.npz")
            if os.path.exists(out_path):
                continue
            xyz0 = read_velodyne_bin(
                os.path.join(root, "sequences", f"{drive:02d}", "velodyne",
                             f"{t0:06d}.bin")
            )
            xyz1 = read_velodyne_bin(
                os.path.join(root, "sequences", f"{drive:02d}", "velodyne",
                             f"{t1:06d}.bin")
            )

            icp_path = os.path.join(icp_dir, f"{key}.npy")
            if os.path.exists(icp_path):
                gt = np.load(icp_path)
            else:
                M = velodyne_pair_gt(poses[t0], poses[t1])
                d0 = voxel_downsample(xyz0.astype(np.float64), icp_voxel)
                d1 = voxel_downsample(xyz1.astype(np.float64), icp_voxel)
                refined, _, _ = icp_point_to_point(
                    jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(M, jnp.float32),
                    max_correspondence_distance=0.2, max_iters=200,
                )
                gt = np.asarray(refined)
                np.save(icp_path, gt)

            k0, f0 = extract_fpfh(xyz0, voxel_size=voxel_size)
            k1, f1 = extract_fpfh(xyz1, voxel_size=voxel_size)
            np.savez(
                out_path,
                xyz0=k0, xyz1=k1, features0=f0, features1=f1, gt_trans=gt,
            )
            print(f"wrote {out_path} ({len(k0)}/{len(k1)} pts)")
