"""Drop-in alias for reference EstimHelpers/PoseEstimator.py."""
from poseestimator_tpu.pipeline.pose_estimator import PoseEstimator

__all__ = ["PoseEstimator"]
