"""One dataclass/YAML configuration tree for the whole pipeline.

SURVEY.md section 5: the reference scatters module-level constants across its
entry scripts (WEIGHTS_PATH / PCD_PATH / CAD_PATH / TARGET_PTS / TRACK_EVERY,
main_realsense.py:14-18 etc.). Here a single ``PipelineConfig`` tree loads
from YAML / kwargs; the dataset.yaml and calibration-YAML schemas stay exactly
as the reference defines them (handled by training.data and
apps.main_seibersdorf) so existing files drop in.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


@dataclass
class DetectorConfig:
    weights: str = "./data/best.pt"
    nc: int = 5
    scale: str = "n"
    imgsz: int = 640
    conf: float = 0.7
    iou: float = 0.7
    max_det: int = 32
    class_id: int = 0


@dataclass
class EstimatorConfig:
    cad_path: str = "./data/obj_000001.ply"
    pcd_path: str = "./data/lego_views/"
    target_points: int = 100
    voxel_size: float = 0.05


@dataclass
class TrackerConfig:
    target_pts: int = 100
    track_every: int = 1
    max_misses: int = 5
    warmup_frames: int = 10
    icp_dist: float = 0.01


@dataclass
class CameraConfig:
    source: str = "realsense"  # realsense | replay:<dir> | synthetic
    width: int = 640
    height: int = 480
    fps: int = 30
    filter_depth: bool = True


@dataclass
class PipelineConfig:
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    estimator: EstimatorConfig = field(default_factory=EstimatorConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    camera: CameraConfig = field(default_factory=CameraConfig)
    metrics_path: Optional[str] = None
    profile_dir: Optional[str] = None


def _from_dict(cls, data: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type.endswith("Config")
        ):
            sub = {
                "detector": DetectorConfig, "estimator": EstimatorConfig,
                "tracker": TrackerConfig, "camera": CameraConfig,
            }[f.name]
            kwargs[f.name] = _from_dict(sub, v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: Optional[str] = None, **overrides) -> PipelineConfig:
    """Load PipelineConfig from a YAML file, then apply flat dotted overrides
    (e.g. ``load_config(p, **{"tracker.icp_dist": 0.05}``))."""
    data = {}
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    cfg = _from_dict(PipelineConfig, data)
    for key, value in overrides.items():
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        if not hasattr(obj, parts[-1]):
            raise KeyError(f"unknown config key {key}")
        setattr(obj, parts[-1], value)
    return cfg


def save_config(cfg: PipelineConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
