"""pipeline: drop-in components mirroring the reference surface — Detector,
PoseEstimator, and the tracking FSM around fused frame programs."""
from .detector import Detector, detect_mask
from .multi_tracking import MultiFrameResult, MultiTracker, TrackedObject
from .offline import find_best_template_teaser
from .pose_estimator import PoseEstimator
from .tracking import FrameResult, Tracker
