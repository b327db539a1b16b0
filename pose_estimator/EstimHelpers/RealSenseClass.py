"""Drop-in alias for reference EstimHelpers/RealSenseClass.py."""
from poseestimator_tpu.camera.source import RealSenseCamera

__all__ = ["RealSenseCamera"]
