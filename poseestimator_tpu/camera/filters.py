"""Depth post-processing filters as JAX image kernels.

librealsense applies spatial (edge-preserving), temporal (EMA with
persistence) and hole-filling filters on the device CPU (reference
RealSenseClass.py:21-23,37-39). Re-implemented here so replayed/synthetic
streams get the same conditioning on-device, inside the frame program.
Algorithms follow the public librealsense filter descriptions:
  - spatial: iterative 1-D exponential smoothing along rows then columns,
    skipping edges where the neighbor step exceeds delta;
  - temporal: EMA blend with the previous frame where |d - prev| < delta,
    with hole persistence;
  - hole filling: 'farthest-from-around' neighbor fill of zero pixels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _no_wrap(shape, axis, shift):
    """Mask out positions whose rolled neighbor wrapped around the image
    border (jnp.roll is circular; depth images are not)."""
    n = shape[axis]
    idx = jnp.arange(n)
    ok = idx >= shift if shift > 0 else idx < n + shift
    bshape = [1] * len(shape)
    bshape[axis] = n
    return ok.reshape(bshape)


@partial(jax.jit, static_argnames=("iterations",))
def spatial_filter(
    depth: jnp.ndarray,
    alpha: float = 0.5,
    delta: float = 0.02,
    iterations: int = 2,
) -> jnp.ndarray:
    """Edge-preserving smoothing. depth (H, W) meters, 0 = hole."""

    def smooth_axis(d, axis):
        def pass_dir(d, shift):
            nb = jnp.roll(d, shift, axis=axis)
            ok = (d > 0) & (nb > 0) & (jnp.abs(d - nb) <= delta)
            ok = ok & _no_wrap(d.shape, axis, shift)
            return jnp.where(ok, alpha * d + (1 - alpha) * nb, d)

        d = pass_dir(d, 1)
        return pass_dir(d, -1)

    for _ in range(iterations):
        depth = smooth_axis(depth, 1)
        depth = smooth_axis(depth, 0)
    return depth


@jax.jit
def temporal_filter(
    depth: jnp.ndarray,
    prev: jnp.ndarray,
    alpha: float = 0.4,
    delta: float = 0.02,
) -> jnp.ndarray:
    """EMA with the previous filtered frame; holes take the previous value.
    Returns the new filtered depth (also the next ``prev``)."""
    both = (depth > 0) & (prev > 0)
    close = both & (jnp.abs(depth - prev) <= delta)
    blended = jnp.where(close, alpha * depth + (1 - alpha) * prev, depth)
    return jnp.where(depth > 0, blended, prev)


@jax.jit
def hole_filling_filter(depth: jnp.ndarray) -> jnp.ndarray:
    """Fill zero pixels from the nearest valid 4-neighbor (two sweeps)."""
    def fill_once(d):
        cands = jnp.stack(
            [jnp.roll(d, s, a) * _no_wrap(d.shape, a, s)
             for s, a in ((1, 1), (-1, 1), (1, 0), (-1, 0))]
        )
        valid = cands > 0
        # farthest-from-camera neighbor (librealsense 'farest_from_around')
        far = jnp.max(jnp.where(valid, cands, 0.0), axis=0)
        return jnp.where(d > 0, d, far)

    return fill_once(fill_once(depth))
