"""Drop-in alias package for ``pose_estimator.EstimHelpers.*`` imports
(reference EstimHelpers/__init__.py carries only a version string)."""

__version__ = "0.1.0"
