"""PointDSC-TPU: a TPU-native point cloud registration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PointDSC
(CVPR'21, "Robust Point Cloud Registration using Deep Spatial Consistency").
The whole registration pipeline -- descriptor-space correspondence matching,
spatial-consistency attention encoding, seed selection, neural spectral
matching, weighted Procrustes, hypothesis selection and post-refinement --
compiles to a single XLA program per pair batch with no host round-trips.

Layout:
  ops/       pure-JAX math core (SE(3), Procrustes/Horn, knn, NMS, power iteration)
  kernels/   Pallas TPU kernels for hot paths (fused SC-attention, ...)
  models/    flax modules (PointDSC, OANet variant, shared blocks)
  data/      dataset readers + padding/bucketing pipeline (3DMatch/KITTI/Redwood)
  train/     losses, metrics, trainer, config/snapshot system
  eval/      benchmark harness (12-column stats protocol)
  parallel/  device-mesh sharding helpers (pjit/shard_map data parallelism)
  baselines/ classical baselines (SM, RANSAC, LS, PMC max-clique)
  multiway/  pose-graph optimization + multiway registration
  native/    C++ components (exact max-clique) with ctypes bindings
"""

__version__ = "0.1.0"
