from pointdsc_tpu.fusion.camera import PinholeIntrinsics, backproject_depth
from pointdsc_tpu.fusion.odometry import depth_odometry
from pointdsc_tpu.fusion.tsdf import TSDFVolume, extract_surface_points
