"""Sharded large-cloud operations: the point-count scaling axis.

SURVEY.md section 5: the analogous capacity axis to sequence parallelism in
this framework is point count. For clouds beyond one chip's comfortable
working set, the query axis shards over the mesh (each device owns a slice of
the queries, the data cloud is replicated) — nearest-neighbor and Chamfer
reduce locally and combine with one psum over ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geom3d.knn import _nn_block
from ..geom3d.masked import masked_mean


def sharded_chamfer(
    mesh: Mesh,
    a_points: jnp.ndarray,
    a_valid: jnp.ndarray,
    b_points: jnp.ndarray,
    b_valid: jnp.ndarray,
    axis: str = "dp",
):
    """Symmetric mean Chamfer with both direction's query axes sharded.

    a (N, 3) and b (M, 3) must have N, M divisible by the mesh axis size.
    Each device computes NN for its query slice against the replicated other
    cloud; sums/counts combine with psum.
    """

    fn = jax.jit(
        jax.shard_map(
            lambda ap, av, bp, bv: _both(ap, av, bp, bv, axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )
    shard = NamedSharding(mesh, P(axis))
    return fn(
        jax.device_put(a_points, shard), jax.device_put(a_valid, shard),
        jax.device_put(b_points, shard), jax.device_put(b_valid, shard),
    )


def _both(ap, av, bp, bv, axis):
    # gather the full opposite cloud once per direction, NN on the local slice
    b_full = jax.lax.all_gather(bp, axis, tiled=True)
    b_vfull = jax.lax.all_gather(bv, axis, tiled=True)
    a_full = jax.lax.all_gather(ap, axis, tiled=True)
    a_vfull = jax.lax.all_gather(av, axis, tiled=True)

    def one_direction(q, qv, d_full, dv_full):
        dist, _, found = _nn_block(q, qv, d_full, dv_full)
        ok = qv & found
        s = jax.lax.psum(jnp.sum(jnp.where(ok, dist, 0.0)), axis)
        n = jax.lax.psum(jnp.sum(ok.astype(jnp.float32)), axis)
        return s / jnp.maximum(n, 1.0)

    return one_direction(ap, av, b_full, b_vfull) + one_direction(bp, bv, a_full, a_vfull)
