"""Drop-in compatibility namespace for the reference package layout.

The reference is imported/run as ``pose_estimator.*`` (src-layout package,
reference pyproject.toml:75-76; README.md:44-47 runs
``python -m pose_estimator.main_realsense``). This package forwards that
surface to the TPU-native implementations so existing scripts and imports
keep working unchanged.
"""

__version__ = "0.1.0"
