"""Drop-in alias for reference EstimHelpers/template_creation.py.

Note: the reference's main_realsense.py:8 imports ``render_lego_views``, a
name template_creation never defines (ImportError at startup — SURVEY.md
section 2.4). For scripts written against that intended name, it is provided
here as an alias of ``render_templates``.
"""
from poseestimator_tpu.templates.creation import (
    add_depth_dependent_noise,
    add_depth_noise,
    get_reduced_camera_positions,
    render_templates,
)
from poseestimator_tpu.geom3d.se3 import look_at as o3d_lookat

render_lego_views = render_templates


def fx_from_fov(fov_deg, width):
    """Reference template_creation.py:7-9."""
    import numpy as np

    return 0.5 * width / np.tan(np.deg2rad(fov_deg) / 2.0)
