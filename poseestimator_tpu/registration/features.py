"""Feature-space correspondence search.

Replaces the feature-kNN half of Open3D's
``registration_ransac_based_on_feature_matching`` (reference
registration_utils.py:177-196): for each source point, its nearest destination
point in 33-dim FPFH space — one MXU matmul-shaped distance matrix plus an
argmin, with an optional mutual-consistency filter.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geom3d.knn import masked_sqdist

_BIG = jnp.float32(3.0e38)


def match_features(
    feat_src: jnp.ndarray,
    src_valid: jnp.ndarray,
    feat_dst: jnp.ndarray,
    dst_valid: jnp.ndarray,
    mutual: bool = False,
):
    """Nearest-neighbor matches src -> dst in feature space.

    Returns ``(idx (N,), match_valid (N,))``: for each source point the index
    of its best destination match. ``mutual=True`` additionally requires the
    destination point's best source match to be the same pair (the
    ``mutual_filter`` option of the Open3D API; the reference passes False).
    """
    d2 = masked_sqdist(feat_src, src_valid, feat_dst, dst_valid)
    idx = jnp.argmin(d2, axis=1)
    ok = (jnp.min(d2, axis=1) < _BIG * 0.5) & src_valid
    if mutual:
        back = jnp.argmin(d2, axis=0)  # best src for each dst
        ok = ok & (back[idx] == jnp.arange(d2.shape[0]))
    return idx, ok
