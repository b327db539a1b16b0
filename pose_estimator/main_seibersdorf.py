"""Drop-in alias: ``python -m pose_estimator.main_seibersdorf`` -> TPU-native
LiDAR+RGB pose estimation."""
from poseestimator_tpu.apps.main_seibersdorf import build_parser, main

if __name__ == "__main__":
    import sys

    sys.exit(main())
