"""Template-axis parallel registration scoring via shard_map.

When the template DB grows past a handful of views (SURVEY.md section 5:
"template-axis parallelism for registration if the template DB grows"), the
per-template hypothesis search shards over devices: each device scores its
slice of templates against the (replicated) observed cloud, and the winner is
reduced with XLA collectives over ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geom3d import alignment_score, voxel_down_sample
from ..geom3d.cloud import PointCloud
from ..registration import icp_point_to_point


def sharded_template_scores(
    mesh: Mesh,
    dst_points: jnp.ndarray,
    dst_valid: jnp.ndarray,
    tpl_points: jnp.ndarray,  # (T, C, 3), T divisible by mesh axis size
    tpl_valid: jnp.ndarray,
    init_T: jnp.ndarray,  # (T, 4, 4) per-template initial transforms
    voxel: float = 0.05,
    axis: str = "tp",
):
    """ICP-refine + score every template, template axis sharded over ``axis``.

    Returns (refined_T (T, 4, 4), scores (T,)) fully replicated (the final
    all_gather rides ICI). The argmin winner is then a host-side pick.
    """
    def score_slice(dst_p, dst_v, tp, tv, t0):
        dst = PointCloud(points=dst_p, valid=dst_v)

        def one(args):
            p, v, h = args
            src = PointCloud(points=p, valid=v)
            coarse = icp_point_to_point(
                src, dst, max_corr_dist=3.0 * voxel, init_T=h, max_iterations=30
            )
            fine = icp_point_to_point(
                src, dst, max_corr_dist=voxel, init_T=coarse.T, max_iterations=100
            )
            sc = alignment_score(src.transform(fine.T), src, dst, voxel)
            return fine.T, sc

        Ts, scores = jax.lax.map(one, (tp, tv, t0))
        # gather every shard's results so each device holds the full ranking
        Ts = jax.lax.all_gather(Ts, axis, tiled=True)
        scores = jax.lax.all_gather(scores, axis, tiled=True)
        return Ts, scores

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        jax.shard_map(
            score_slice,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            # all_gather(tiled) makes outputs bitwise-replicated; the static
            # varying-axis check cannot infer that
            check_vma=False,
        )
    )
    return fn(
        jax.device_put(dst_points, repl),
        jax.device_put(dst_valid, repl),
        jax.device_put(tpl_points, shard),
        jax.device_put(tpl_valid, shard),
        jax.device_put(init_T, shard),
    )
