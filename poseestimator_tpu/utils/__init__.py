"""utils: host-side I/O and support code (PLY, BOP, config, metrics,
profiling, overlays)."""
from .config import (
    CameraConfig,
    DetectorConfig,
    EstimatorConfig,
    PipelineConfig,
    TrackerConfig,
    load_config,
    save_config,
)
from .metrics_log import FrameMetrics, MetricsLogger, TemplateMetrics
from .plyio import PlyData, read_ply, write_ply
from .profiling import StageTimer, xla_trace
