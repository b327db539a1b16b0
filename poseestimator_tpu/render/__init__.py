"""render: TPU-native depth/shaded rendering — the Filament OffscreenRenderer
replacement (SURVEY.md section 2.2). Two instruments: the point-splat
scatter-min z-buffer (``points``) and the exact triangle rasterizer
(``raster``, tiled Pallas kernel / XLA scan)."""
from .mesh import (
    TriangleMesh,
    load_geometry,
    make_icosphere,
    pad_faces,
    simplify_vertex_clustering,
)
from .points import render_depth, render_shaded, vsd_metric, vsd_multi_tau
from .raster import render_depth_mesh
