"""parallel: device-mesh utilities and sharded execution helpers.

The reference is single-process/single-GPU (SURVEY.md section 2.3 — no
distributed backend exists upstream); this package provides the TPU-native
scaling axes the new framework adds: data-parallel training over ICI and
template-axis parallel registration.
"""
from .bigcloud import sharded_chamfer
from .mesh import make_mesh, replicate, shard_along
from .registration import make_synthetic_search_inputs, sharded_template_search
from .serving import ShardedDetector
from .tracking import sharded_multi_track
