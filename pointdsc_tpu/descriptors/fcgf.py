"""FCGF-style learned descriptor backend: dense-voxel 3D ResUNet.

The reference extracts FCGF descriptors with a MinkowskiEngine sparse
ResUNet (/root/reference/misc/fcgf.py:621-852, extract_features at
misc/cal_fcgf.py:57-85). MinkowskiEngine has no TPU analog; sparse
gather/scatter convolutions map poorly onto the MXU. The TPU-native design
is a *dense* voxel U-Net: at 3DMatch's 5 cm voxels an indoor fragment fits a
96^3 grid (0.9 M voxels), and dense 3D convolutions are exactly the large
regular contractions the MXU wants. Points are voxelized to a dense
occupancy grid, run through a 4-down/4-up ResUNet with skip connections
(channel plan mirrors the reference's ResUNetBN2C: enc [32,64,128,256],
dec [128,128,96,96] -> final 1x1 to 32), and per-point descriptors are
gathered from their voxel cells and L2-normalized (fcgf.py:845-849).

For outdoor scale (KITTI, 30 cm voxels over ~100 m) the cloud is processed
in overlapping spatial tiles of the same grid size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def voxelize(points: np.ndarray, voxel_size: float, grid_size: int,
             origin: np.ndarray | None = None):
    """Quantize points to a dense grid.

    Returns (occupancy [D,D,D,1] float32, indices [N, 3] int32 clipped to the
    grid, origin [3]). Points outside the grid are clamped to the border
    (callers should tile large clouds instead).
    """
    pts = np.asarray(points, np.float64)
    origin = pts.min(0) if origin is None else np.asarray(origin, np.float64)
    idx = np.floor((pts - origin) / voxel_size).astype(np.int32)
    idx = np.clip(idx, 0, grid_size - 1)
    occ = np.zeros((grid_size, grid_size, grid_size, 1), np.float32)
    occ[idx[:, 0], idx[:, 1], idx[:, 2], 0] = 1.0
    return occ, idx, origin


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (3, 3, 3), strides=(self.stride,) * 3, padding="SAME"
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1))(x)
        return nn.relu(x + h)


class VoxelFCGF(nn.Module):
    """Dense-voxel ResUNet descriptor network (FCGF capability parity).

    Input:  occupancy grid [B, D, D, D, 1]
    Output: feature grid   [B, D, D, D, out_dim], L2-normalized per voxel.
    """

    out_dim: int = 32
    enc_channels: tuple = (32, 64, 128, 256)
    dec_channels: tuple = (128, 128, 96, 96)
    normalize: bool = True

    @nn.compact
    def __call__(self, occ, train: bool = False):
        x = ConvBlock(self.enc_channels[0])(occ, train)  # stem
        skips = []
        for ch in self.enc_channels:
            x = ResBlock(ch)(x, train)
            skips.append(x)
            x = ConvBlock(ch, stride=2)(x, train)  # downsample

        x = ResBlock(self.enc_channels[-1])(x, train)

        for ch, skip in zip(self.dec_channels, reversed(skips)):
            x = nn.ConvTranspose(ch, (3, 3, 3), strides=(2, 2, 2), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
            x = jnp.concatenate([x, skip], axis=-1)  # skip cat (fcgf.py:816-840)
            x = ResBlock(ch)(x, train)

        x = nn.Conv(self.out_dim, (1, 1, 1))(x)  # final 1x1 (fcgf.py:845)
        if self.normalize:
            x = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        return x


def extract_features(
    model: VoxelFCGF,
    variables,
    points: np.ndarray,
    voxel_size: float = 0.05,
    grid_size: int = 96,
    origin: np.ndarray | None = None,
):
    """Per-point descriptors (API parity with misc/cal_fcgf.py:57-85).

    Returns (unique voxel-center keypts [M, 3], features [M, out_dim]).
    """
    occ, idx, origin = voxelize(points, voxel_size, grid_size, origin=origin)
    # unique occupied voxels play the role of the sparse tensor coordinates
    uniq, uidx = np.unique(idx, axis=0, return_index=True)
    grid = model.apply(variables, jnp.asarray(occ)[None], train=False)[0]
    feats = np.asarray(grid[uniq[:, 0], uniq[:, 1], uniq[:, 2]])
    keypts = (uniq.astype(np.float64) + 0.5) * voxel_size + origin
    return keypts.astype(np.float32), feats


# keyed on the (hashable, frozen-dataclass) flax Module itself: two calls
# with equal module configs share one compiled apply, and the cache cannot
# alias a new module that reuses a dead module's id()
_tiled_apply_cache: dict = {}


def extract_features_tiled(
    model: VoxelFCGF,
    variables,
    points: np.ndarray,
    voxel_size: float = 0.30,
    grid_size: int = 96,
    halo: int = 8,
    tile_batch: int = 4,
):
    """Outdoor-scale extraction (KITTI at 30 cm voxels over ~100 m): the
    cloud is processed in overlapping spatial tiles of `grid_size` voxels;
    each point's descriptor comes from the tile whose interior contains it
    (the `halo` border absorbs convolution boundary effects).

    Tiles run through the U-Net `tile_batch` at a time in one batched
    dispatch (the last batch is padded with empty grids), so a ~100 m KITTI
    cloud is a handful of device calls instead of one per occupied tile.

    Returns (keypts [M, 3], features [M, out_dim]) over all occupied voxels.
    """
    pts = np.asarray(points, np.float64)
    origin = pts.min(0)
    extent = int(grid_size - 2 * halo)
    tile_idx = np.floor((pts - origin) / (voxel_size * extent)).astype(np.int64)

    # host-side prep: per-tile occupancy grid + unique occupied voxels
    tiles = []  # (occ, uniq_idx, tile_origin, tile_coord)
    for t in np.unique(tile_idx, axis=0):
        tile_origin = origin + t * voxel_size * extent - halo * voxel_size
        local = pts - tile_origin
        inside = np.all(
            (local >= 0) & (local < grid_size * voxel_size), axis=1
        )
        interior = np.all(tile_idx == t, axis=1)
        sel = pts[inside | interior]
        if len(sel) == 0:
            continue
        occ, idx, _ = voxelize(
            sel - tile_origin, voxel_size, grid_size, origin=np.zeros(3)
        )
        uniq = np.unique(idx, axis=0)
        tiles.append((occ, uniq, tile_origin, t))
    if not tiles:
        return np.zeros((0, 3), np.float32), np.zeros((0, model.out_dim), np.float32)

    # one jitted batched apply, padded to a fixed tile_batch; cached per
    # model so repeated calls (batch descriptor prep loops over thousands
    # of clouds) compile the U-Net once, not once per cloud
    apply = _tiled_apply_cache.get(model)
    if apply is None:
        apply = jax.jit(partial(model.apply, train=False))
        _tiled_apply_cache[model] = apply

    all_k, all_f = [], []
    for lo in range(0, len(tiles), tile_batch):
        chunk = tiles[lo : lo + tile_batch]
        occs = np.stack([c[0] for c in chunk])
        if len(chunk) < tile_batch:  # pad: empty grids compile-share the shape
            occs = np.concatenate(
                [occs, np.zeros((tile_batch - len(chunk),) + occs.shape[1:],
                                np.float32)]
            )
        grids = np.asarray(apply(variables, jnp.asarray(occs)))
        for (occ, uniq, tile_origin, t), grid in zip(chunk, grids):
            feats = grid[uniq[:, 0], uniq[:, 1], uniq[:, 2]]
            keypts = (uniq.astype(np.float64) + 0.5) * voxel_size + tile_origin
            # keep only interior voxels (avoid duplicates across tiles)
            rel = (keypts - (origin + t * voxel_size * extent)) / (
                voxel_size * extent
            )
            keep = np.all((rel >= 0) & (rel < 1.0), axis=1)
            all_k.append(keypts[keep].astype(np.float32))
            all_f.append(feats[keep])
    return np.concatenate(all_k), np.concatenate(all_f)
