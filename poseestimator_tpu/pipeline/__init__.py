"""pipeline: drop-in components mirroring the reference surface — Detector,
PoseEstimator, and the tracking FSM around fused frame programs."""
from .detector import Detector, detect_mask
from .pose_estimator import PoseEstimator
from .tracking import FrameResult, Tracker
