"""registration: feature matching, RANSAC, ICP, and a TEASER-class certifiable
robust solver — the TPU-native replacement for Open3D's registration pipelines
and the TEASER++ C++ submodule (SURVEY.md sections 2.2, 3.4)."""
from .features import match_features
from .icp import ICPResult, icp_point_to_plane, icp_point_to_point
from .kabsch import kabsch, kabsch_T
from .maxclique import max_clique_greedy, max_kcore
from .ransac import RansacResult, get_correspondences, ransac_registration
from .teaser import (
    InlierGraphFormulation,
    InlierSelectionMode,
    RotationEstimationAlgorithm,
    TeaserParams,
    TeaserSolution,
    teaser_solve,
)
