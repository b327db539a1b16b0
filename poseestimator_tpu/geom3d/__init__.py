"""geom3d: fixed-shape, XLA-native 3D geometry core.

The TPU-native replacement for the reference's Open3D/scipy geometry layer
(SURVEY.md sections 1-2): padded point clouds, SE(3) math, brute-force
(MXU-shaped) nearest neighbors, sampling, normals, FPFH, cameras, metrics.
"""
from .cloud import PointCloud, bounding_box, compact, from_points, to_numpy
from .camera import Intrinsics, backproject_depth, project_points, project_points_distorted
from .fpfh import compute_fpfh
from .knn import knn, masked_sqdist, nearest_neighbor, pairwise_sqdist, radius_knn
from .masked import (
    masked_max,
    masked_mean,
    masked_median,
    masked_min,
    masked_percentile,
    masked_std,
)
from .metrics import (
    add_metric,
    adds_metric,
    alignment_score,
    chamfer_distance,
    cloud_resolution,
    mspd_metric,
    mssd_metric,
    nn_residuals,
)
from .normals import estimate_normals
from .outliers import remove_statistical_outlier
from .sampling import (
    downsample_to,
    farthest_point_sampling,
    random_sample,
    voxel_coverage,
    voxel_down_sample,
)
from .se3 import (
    angular_error,
    axis_angle_to_R,
    camera_eye_lookat_up_from_H,
    enforce_upright_pose_y_up,
    euler_xyz_to_R,
    initial_align_centroid_pca,
    inv_T,
    look_at,
    make_T,
    pca_axes,
    quat_to_R,
    random_rotation,
    rot_x,
    rot_y,
    rot_z,
    transform_points,
)
