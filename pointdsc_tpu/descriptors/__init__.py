from pointdsc_tpu.descriptors.fpfh import (
    voxel_downsample,
    estimate_normals,
    fpfh_features,
    extract_fpfh,
)
