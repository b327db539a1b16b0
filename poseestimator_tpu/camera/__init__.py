"""camera: CameraSource protocol + RealSense / replay / synthetic impls and
JAX depth filters (reference RealSenseClass.py; SURVEY.md section 2.2)."""
from .filters import hole_filling_filter, spatial_filter, temporal_filter
from .source import (
    CameraSource,
    PCD_CAPACITY,
    RealSenseCamera,
    ReplayCamera,
    SyntheticCamera,
)
