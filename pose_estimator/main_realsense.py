"""Drop-in alias: ``python -m pose_estimator.main_realsense`` (the reference's
documented run command, README.md:44-47 — including its typo'd variant) runs
the TPU-native realtime tracker."""
from poseestimator_tpu.apps.main_realsense import build_parser, main

if __name__ == "__main__":
    import sys

    sys.exit(main())
