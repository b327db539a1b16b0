"""templates: CAD template view rendering + disk-cached template database
(reference template_creation.py + PoseEstimator.load_templates)."""
from .creation import get_reduced_camera_positions, render_templates
from .db import TemplateDB, load_templates
