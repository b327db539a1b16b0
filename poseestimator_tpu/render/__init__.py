"""render: TPU-native depth/shaded rendering of presampled CAD surfaces —
replaces the Filament OffscreenRenderer depth path (SURVEY.md section 2.2)."""
from .mesh import TriangleMesh, load_geometry
from .points import render_depth, render_shaded, vsd_metric, vsd_multi_tau
