from pointdsc_tpu.multiway.pose_graph import (
    PoseGraph,
    PoseGraphEdge,
    optimize_pose_graph,
)
from pointdsc_tpu.multiway.ate import align_trajectories, ate_rmse
