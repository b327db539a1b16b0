"""Object-axis parallel tracking: the batched per-frame track step
(``pipeline.multi_tracking._batched_track``) with the TRACK axis sharded
over a device mesh.

Single-chip, MultiTracker advances N instances in one vmapped program; when
the instance count outgrows a chip (dense ICP is ~MB-scale VMEM per track),
the batch axis shards: every device renders/registers its slice of tracks
against the REPLICATED frame (depth is broadcast once per frame, ~1.2 MB at
640x480 — cheap next to shipping per-track clouds), and the updated poses
ride back via the all_gather of the output specs. Per-track PRNG keys shard
with their tracks, so results are bitwise-independent of the partitioning
(same property as the template-axis search, tests/test_parallel.py).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geom3d import Intrinsics
from ..pipeline.tracking import _track_step


@lru_cache(maxsize=16)
def _sharded_track_fn(mesh: Mesh, axis: str, intr: Intrinsics,
                      target_pts: int):
    def slice_fn(mesh_v, mesh_f, masks, depth, Ts, keys, icp_dists):
        out = jax.vmap(
            _track_step, in_axes=(None, None, 0, None, 0, None, None, 0, 0)
        )(mesh_v, mesh_f, masks, depth, Ts, intr, target_pts, keys, icp_dists)
        gather = lambda a: jax.lax.all_gather(a, axis, tiled=True)
        return tuple(gather(o) for o in out)

    return jax.jit(
        jax.shard_map(
            slice_fn, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P(), P()),
            # all_gather(tiled) makes outputs bitwise-replicated; the static
            # varying-axis check cannot infer that
            check_vma=False,
        )
    )


def sharded_multi_track(
    mesh: Mesh,
    mesh_v: jnp.ndarray,
    mesh_f: jnp.ndarray,
    masks: jnp.ndarray,  # (B, H, W), B divisible by the mesh axis size
    depth: jnp.ndarray,  # (H, W) shared frame
    Ts: jnp.ndarray,  # (B, 4, 4)
    intr: Intrinsics,
    target_pts: int,
    keys: jnp.ndarray,  # (B, 2) per-track PRNG keys
    icp_dists: jnp.ndarray,  # (B,)
    axis: str = "dp",
):
    """One sharded multi-object frame step. Returns ``(T_new (B,4,4),
    fitness (B,), rmse (B,), cov (B,6,6))`` fully replicated."""
    B = Ts.shape[0]
    n_dev = mesh.shape[axis]
    assert B % n_dev == 0, (B, n_dev)
    fn = _sharded_track_fn(mesh, axis, intr, int(target_pts))
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = lambda a, s: jax.device_put(a, s)
    return fn(
        put(mesh_v, repl), put(mesh_f, repl), put(masks, shard),
        put(depth, repl), put(Ts, shard), put(keys, shard),
        put(icp_dists, shard),
    )
