"""Drop-in alias for reference EstimHelpers/detection_utils.py."""
from poseestimator_tpu.pipeline.detector import detect_mask

__all__ = ["detect_mask"]
