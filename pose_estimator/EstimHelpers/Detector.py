"""Drop-in alias: ``from pose_estimator.EstimHelpers.Detector import Detector``
(reference EstimHelpers/Detector.py surface) -> TPU-native Detector."""
from poseestimator_tpu.pipeline.detector import Detector

__all__ = ["Detector"]
