"""Drop-in alias: ``python -m pose_estimator.main_image`` -> TPU-native
offline BOP evaluation."""
from poseestimator_tpu.apps.main_image import build_parser, main

if __name__ == "__main__":
    import sys

    sys.exit(main())
