"""poseestimator_tpu: TPU-native 6D object pose estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
patricksko/PoseEstimator (see SURVEY.md): YOLO11-seg detection, RGB-D
back-projection, FPFH/RANSAC correspondences, a TEASER-class certifiable
robust registration solver, ICP refinement, template rendering, and a
camera-rate tracking loop — all as fused on-device programs.
"""

__version__ = "0.1.0"
