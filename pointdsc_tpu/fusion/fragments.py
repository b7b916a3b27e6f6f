"""Fragment builder: RGB-D sequence -> TSDF-fused fragment point clouds.

Rebuilds /root/reference/multiway/make_fragments.py:64-175 without Open3D:
frames are chunked into fragments (100 frames each, reference
initialize_config.py n_frames_per_fragment), chained with projective
point-to-plane depth odometry, refined by a per-fragment pose graph with
keyframe loop-closure edges, integrated into a dense TSDF volume, and the
extracted surface points are written as `fragment_%03d.ply` plus the
`fragment_%03d.npy` pose and an FPFH descriptor `.npz` -- the exact inputs
RedwoodDataset expects.

Depth images are 16-bit PNGs (millimeters, depth_scale=1000).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from pointdsc_tpu.fusion.camera import PinholeIntrinsics
from pointdsc_tpu.fusion.odometry import depth_odometry, rgbd_odometry
from pointdsc_tpu.fusion.tsdf import TSDFVolume, extract_surface_points
from pointdsc_tpu.multiway.pose_graph import PoseGraph, PoseGraphEdge, optimize_pose_graph


def read_depth_png(path: str, depth_scale: float = 1000.0) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path), dtype=np.float32)
    return img / depth_scale


def read_intensity_png(path: str) -> np.ndarray:
    """Color PNG -> grayscale intensity in [0, 1] (Open3D's RGB-D odometry
    likewise converts to float intensity)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"), dtype=np.float32)
    return img / 255.0


def build_fragment(
    depth_paths: list[str],
    intr: PinholeIntrinsics | None = None,
    voxel_size: float = 0.008,
    sdf_trunc: float = 0.04,
    keyframe_every: int = 5,
    depth_trunc: float = 4.0,
    grid_dims: tuple = (256, 256, 256),
    color_paths: list[str] | None = None,
):
    """Fuse one fragment. Returns (points [N, 3], frame_poses list of 4x4
    cam->fragment). With `color_paths`, tracking uses the hybrid
    photometric+geometric objective (reference make_fragments.py:64-109);
    depth-only falls back to point-to-plane ICP."""
    import jax.numpy as jnp

    intr = intr or PinholeIntrinsics.primesense_default()
    depths = [read_depth_png(p) if isinstance(p, str) else np.asarray(p)
              for p in depth_paths]
    colors = None
    if color_paths is not None:
        colors = [read_intensity_png(p) if isinstance(p, str) else np.asarray(p)
                  for p in color_paths]
        assert len(colors) == len(depths)

    def track(i, j, init=None):
        if colors is None:
            return depth_odometry(
                jnp.asarray(depths[i]), jnp.asarray(depths[j]), intr,
                init_trans=init,
            )
        return rgbd_odometry(
            jnp.asarray(colors[i]), jnp.asarray(depths[i]),
            jnp.asarray(colors[j]), jnp.asarray(depths[j]), intr,
            init_trans=init,
        )

    # odometry chain + keyframe edges -> fragment pose graph
    poses = [np.eye(4)]
    edges = []
    for i in range(len(depths) - 1):
        trans, frac = track(i, i + 1)
        trans = np.asarray(trans)
        # camera_i -> camera_{i+1}; node poses are cam -> fragment(=cam_0)
        poses.append(poses[-1] @ np.linalg.inv(trans))
        edges.append(PoseGraphEdge(i, i + 1, np.linalg.inv(trans), np.eye(6),
                                   uncertain=False))
    for i in range(0, len(depths) - keyframe_every, keyframe_every):
        j = i + keyframe_every
        init = np.linalg.inv(np.linalg.inv(poses[j]) @ poses[i])
        trans, frac = track(
            i, j, init=jnp.asarray(np.linalg.inv(init), jnp.float32)
        )
        if float(frac) > 0.3:
            edges.append(PoseGraphEdge(i, j, np.linalg.inv(np.asarray(trans)),
                                       np.eye(6), uncertain=True))
    if len(poses) > 1:
        graph = optimize_pose_graph(PoseGraph(poses=poses, edges=edges),
                                    max_correspondence_distance=0.07)
        poses = [np.asarray(p) for p in graph.poses]

    # volume origin from the observed geometry: center the grid on the
    # first frame's backprojected points (fragment frame == camera 0 frame)
    from pointdsc_tpu.fusion.camera import backproject_depth

    pts0, valid0 = backproject_depth(
        jnp.asarray(depths[0], jnp.float32), intr, depth_trunc=depth_trunc
    )
    pts0 = np.asarray(pts0)[np.asarray(valid0)]
    vol_extent = np.asarray(grid_dims) * voxel_size
    if len(pts0):
        center = 0.5 * (pts0.min(0) + pts0.max(0))
    else:
        center = np.array([0.0, 0.0, vol_extent[2] / 2])
    origin = center - vol_extent / 2
    vol = TSDFVolume(origin=origin, voxel_size=voxel_size, sdf_trunc=sdf_trunc,
                     dims=grid_dims)
    for depth, pose in zip(depths, poses):
        vol.integrate(jnp.asarray(depth), intr, jnp.asarray(pose, np.float32))

    points = extract_surface_points(vol)
    return points, poses


def make_fragments(
    dataset_dir: str,
    out_dir: str,
    n_frames_per_fragment: int = 100,
    voxel_size: float = 0.008,
    fpfh_voxel: float = 0.05,
    intr: PinholeIntrinsics | None = None,
):
    """Process a scene directory with a depth/ subfolder of 16-bit PNGs.
    An image/ (or rgb/) subfolder of color frames, when present, switches
    tracking to the hybrid photometric+geometric objective."""
    from pointdsc_tpu.data.ply import write_ply_xyz
    from pointdsc_tpu.descriptors import extract_fpfh

    depth_files = sorted(
        glob.glob(os.path.join(dataset_dir, "depth", "*.png"))
    )
    color_files = None
    for sub in ("image", "rgb", "color"):
        cand = sorted(
            glob.glob(os.path.join(dataset_dir, sub, "*.png"))
            + glob.glob(os.path.join(dataset_dir, sub, "*.jpg"))
        )
        if len(cand) == len(depth_files) and cand:
            color_files = cand
            break
    os.makedirs(out_dir, exist_ok=True)
    n_fragments = int(np.ceil(len(depth_files) / n_frames_per_fragment))
    world_pose = np.eye(4)
    for f in range(n_fragments):
        sl = slice(f * n_frames_per_fragment, (f + 1) * n_frames_per_fragment)
        chunk = depth_files[sl]
        cchunk = color_files[sl] if color_files else None
        points, poses = build_fragment(chunk, intr=intr, voxel_size=voxel_size,
                                       color_paths=cchunk)
        write_ply_xyz(os.path.join(out_dir, f"fragment_{f:03d}.ply"), points)
        np.save(os.path.join(out_dir, f"fragment_{f:03d}.npy"), world_pose)
        keypts, feats = extract_fpfh(points, voxel_size=fpfh_voxel)
        np.savez(
            os.path.join(out_dir, f"fragment_{f:03d}_fpfh.npz"),
            xyz=keypts, feature=feats,
        )
        # advance the world pose by the fragment's internal motion
        world_pose = world_pose @ poses[-1]
        print(f"fragment {f}: {len(points)} surface points")
