"""FPFH backend: downsampling, normals, descriptor invariances, PLY IO."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointdsc_tpu.data.ply import read_ply_xyz, write_ply_xyz
from pointdsc_tpu.descriptors import (
    estimate_normals,
    extract_fpfh,
    fpfh_features,
    voxel_downsample,
)
from pointdsc_tpu.data import transforms_np as T


class TestVoxelDownsample:
    def test_grid_collapse(self):
        pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1.0, 1.0]])
        down = voxel_downsample(pts, 0.05)
        assert down.shape == (2, 3)

    def test_preserves_extent(self, rng):
        pts = rng.uniform(-1, 1, (5000, 3))
        down = voxel_downsample(pts, 0.1)
        assert 100 < len(down) < 5000
        np.testing.assert_allclose(down.min(0), pts.min(0), atol=0.2)


class TestNormals:
    def test_plane_normals(self, rng):
        # points on z=0 plane -> normals +-z
        pts = np.zeros((500, 3), np.float32)
        pts[:, :2] = rng.uniform(-1, 1, (500, 2))
        normals = np.asarray(estimate_normals(jnp.asarray(pts), radius=0.3))
        nz = np.abs(normals[:, 2])
        assert (nz > 0.99).mean() > 0.95

    def test_sphere_normals_point_radially(self, rng):
        dirs = rng.normal(size=(800, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        pts = (dirs * 1.0).astype(np.float32)
        normals = np.asarray(estimate_normals(jnp.asarray(pts), radius=0.3))
        cos = np.abs(np.sum(normals * dirs, axis=-1))
        assert (cos > 0.95).mean() > 0.9


class TestFPFH:
    def _cloud(self, rng, n=600):
        # bumpy surface with geometric variation
        xy = rng.uniform(-1, 1, (n, 2))
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        return np.stack([xy[:, 0], xy[:, 1], z], axis=-1).astype(np.float32)

    def test_shapes_and_finite(self, rng):
        pts = self._cloud(rng)
        normals = estimate_normals(jnp.asarray(pts), radius=0.25)
        feats = np.asarray(fpfh_features(jnp.asarray(pts), normals, radius=0.4))
        assert feats.shape == (len(pts), 33)
        assert np.isfinite(feats).all()
        assert (feats.sum(-1) > 0).mean() > 0.99

    def test_rotation_invariance(self, rng):
        """FPFH is rotation invariant: matched descriptors of a rotated cloud
        must be close after L2 normalization."""
        pts = self._cloud(rng)
        R = T.rotation_matrix(3, 1.0, rng)
        pts_rot = (pts @ R.T).astype(np.float32)

        def desc(p):
            normals = estimate_normals(jnp.asarray(p), radius=0.25)
            f = np.asarray(fpfh_features(jnp.asarray(p), normals, radius=0.4))
            return f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-9)

        f0, f1 = desc(pts), desc(pts_rot)
        cos = np.sum(f0 * f1, axis=-1)
        assert np.median(cos) > 0.97, float(np.median(cos))

    def test_matching_quality_on_transformed_cloud(self, rng):
        """NN matching in FPFH space recovers mostly-correct correspondences
        between a cloud and its rigid transform."""
        pts = self._cloud(rng, n=500)
        trans = T.integrate_trans(
            T.rotation_matrix(3, 1.0, rng), T.translation_matrix(0.5, rng)
        )
        pts2 = T.transform(pts.astype(np.float64), trans).astype(np.float32)

        def desc(p):
            normals = estimate_normals(jnp.asarray(p), radius=0.25)
            f = np.asarray(fpfh_features(jnp.asarray(p), normals, radius=0.4))
            return f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-9)

        f0, f1 = desc(pts), desc(pts2)
        match = np.argmax(f0 @ f1.T, axis=1)
        acc = (match == np.arange(len(pts))).mean()
        # the periodic test surface is locally ambiguous, so exact-NN
        # accuracy well above chance (1/500) is the right bar -- the
        # downstream outlier rejection is built for far worse inlier ratios
        assert acc > 0.3, f"NN matching accuracy {acc}"


class TestPly:
    def test_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        path = str(tmp_path / "cloud.ply")
        write_ply_xyz(path, pts)
        back = read_ply_xyz(path)
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_reads_demo_data(self):
        pts = read_ply_xyz("/root/reference/demo_data/cloud_bin_0.ply")
        assert pts.shape[0] == 258342
        assert np.isfinite(pts).all()
