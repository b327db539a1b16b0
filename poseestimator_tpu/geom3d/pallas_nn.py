"""Pallas TPU kernel: fused nearest-neighbor (distance + running min/argmin).

The XLA path materializes the (N, M) squared-distance matrix in HBM before
reducing it; for the full-cloud queries (Chamfer on 16k x 16k) that is
~1 GB of HBM traffic per direction. This kernel keeps the whole data cloud in
VMEM (16k points x 3 f32 = 200 KB), streams query tiles, and carries the
running (min, argmin) in registers — HBM traffic drops to reading each cloud
once, the VPU-shaped distance form
``d2_ij = qx_i^2+... + bx_j^2+... - 2(qx_i bx_j + qy_i by_j + qz_i bz_j)``
avoids a K=3 matmul the MXU would waste cycles on.

Coordinates are passed as column-separated (N,) arrays so every buffer is
lane-aligned. The public entry transparently pads to tile multiples and falls
back to the XLA path off-TPU; tests run the kernel in interpreter mode.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel

_TQ = 256  # query rows per program
_TD = 2048  # data columns per inner step


def _nn_kernel(qx_ref, qy_ref, qz_ref, q2_ref, dx_ref, dy_ref, dz_ref, d2_ref,
               out_d2_ref, out_idx_ref):
    qx = qx_ref[:]  # (TQ, 1)
    qy = qy_ref[:]
    qz = qz_ref[:]
    q2 = q2_ref[:]
    M = dx_ref.shape[1]
    n_tiles = M // _TD

    def body(j, carry):
        best, bidx = carry
        sl = pl.ds(j * _TD, _TD)
        bx = dx_ref[:, sl]  # (1, TD)
        by = dy_ref[:, sl]
        bz = dz_ref[:, sl]
        b2 = d2_ref[:, sl]  # data |b|^2, BIG where invalid
        cross = qx * bx + qy * by + qz * bz  # (TQ, TD)
        d2 = q2 + b2 - 2.0 * cross
        m = jnp.min(d2, axis=1)  # (TQ,)
        am = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * _TD
        upd = m < best
        return jnp.where(upd, m, best), jnp.where(upd, am, bidx)

    best0 = jnp.full((_TQ,), _BIG, jnp.float32)
    bidx0 = jnp.zeros((_TQ,), jnp.int32)
    best, bidx = jax.lax.fori_loop(0, n_tiles, body, (best0, bidx0))
    out_d2_ref[:] = best[:, None]
    out_idx_ref[:] = bidx[:, None]


@partial(jax.jit, static_argnames=("interpret",))
def nn_pallas(
    query: jnp.ndarray,
    query_valid: jnp.ndarray,
    data: jnp.ndarray,
    data_valid: jnp.ndarray,
    interpret: bool = False,
):
    """Nearest data index per query point. Returns (dist, idx, found).

    Semantics identical to ``knn.nearest_neighbor`` (invalid data never
    matches; invalid queries return found=False).
    """
    N = query.shape[0]
    M = data.shape[0]
    Np = -(-N // _TQ) * _TQ
    Mp = -(-M // _TD) * _TD

    def padcol(a, n, fill=0.0):
        return jnp.concatenate([a, jnp.full((n - a.shape[0],), fill, a.dtype)])

    qx = padcol(query[:, 0], Np)[:, None]  # (Np, 1)
    qy = padcol(query[:, 1], Np)[:, None]
    qz = padcol(query[:, 2], Np)[:, None]
    q2 = (qx * qx + qy * qy + qz * qz)

    dv = padcol(data_valid.astype(jnp.float32), Mp)[None, :]  # (1, Mp)
    dx = padcol(data[:, 0], Mp)[None, :]
    dy = padcol(data[:, 1], Mp)[None, :]
    dz = padcol(data[:, 2], Mp)[None, :]
    b2 = dx * dx + dy * dy + dz * dz
    b2 = jnp.where(dv > 0, b2, _BIG)  # invalid data -> unreachable

    grid = (Np // _TQ,)
    qspec = pl.BlockSpec((_TQ, 1), lambda i: (i, 0))
    dspec = pl.BlockSpec((1, Mp), lambda i: (0, 0))
    out_d2, out_idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[qspec, qspec, qspec, qspec, dspec, dspec, dspec, dspec],
        out_specs=[
            pl.BlockSpec((_TQ, 1), lambda i: (i, 0)),
            pl.BlockSpec((_TQ, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ],
        interpret=interpret,
    )(qx, qy, qz, q2, dx, dy, dz, b2)

    d2 = out_d2[:N, 0]
    idx = jnp.clip(out_idx[:N, 0], 0, M - 1)
    found = query_valid & (d2 < _BIG * 0.5) & jnp.any(data_valid)
    # exact recompute of the winning pair (cancellation guard, see knn.py)
    diff = query - data[idx]
    best = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(jnp.where(found, best, 0.0)), idx, found
