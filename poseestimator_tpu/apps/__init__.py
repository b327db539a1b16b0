"""apps: the three reference entry points, drop-in (main_realsense,
main_image, main_seibersdorf) — run as ``python -m poseestimator_tpu.apps.<name>``."""
