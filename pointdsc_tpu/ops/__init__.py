"""Pure-JAX math core shared by every layer above.

All functions are jit/vmap-friendly: static shapes, no data-dependent Python
control flow, masking instead of boolean indexing.
"""

from pointdsc_tpu.ops.se3 import (
    transform,
    integrate_trans,
    decompose_trans,
    concatenate_trans,
    relative_rotation_error,
    relative_translation_error,
)
from pointdsc_tpu.ops.linalg import jacobi_eigh, symeig3x3, symeig4x4
from pointdsc_tpu.ops.procrustes import weighted_procrustes, rotation_from_covariance
from pointdsc_tpu.ops.knn import feature_knn, pairwise_sq_dists, pairwise_dists
from pointdsc_tpu.ops.eig import power_iteration
from pointdsc_tpu.ops.nms import pick_seeds_nms, pick_seeds_topk
from pointdsc_tpu.ops.compatibility import spatial_consistency, feature_similarity
from pointdsc_tpu.ops.matching import match_descriptors, inlier_labels
