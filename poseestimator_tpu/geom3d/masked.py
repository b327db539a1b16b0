"""Masked reductions over padded arrays.

Open3D/numpy code in the reference operates on variable-length arrays
(median/percentile over NN residuals, HelpersRealtime.py:112-130). With padded
fixed-shape arrays those statistics need mask-aware versions; they live here so
every subsystem shares one implementation.
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None):
    w = mask.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w, axis=axis), 1.0)
    return jnp.sum(x * w, axis=axis) / n


def masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis=None, fill=_BIG):
    return jnp.min(jnp.where(mask, x, fill), axis=axis)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis=None, fill=-_BIG):
    return jnp.max(jnp.where(mask, x, fill), axis=axis)


def masked_std(x: jnp.ndarray, mask: jnp.ndarray, axis=None):
    m = masked_mean(x, mask, axis=axis)
    if axis is not None:
        m = jnp.expand_dims(m, axis)
    v = masked_mean((x - m) ** 2, mask, axis=axis)
    return jnp.sqrt(jnp.maximum(v, 0.0))


def masked_percentile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """Percentile over the valid entries of a 1-D padded array.

    Matches ``np.percentile(x[mask], q)`` (linear interpolation) for any number
    of valid entries >= 1; returns 0 for an empty mask.
    """
    x = jnp.where(mask, x, _BIG)
    xs = jnp.sort(x)
    n = jnp.sum(mask.astype(jnp.int32))
    pos = (q / 100.0) * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(n - 1, 0))
    frac = pos - lo.astype(jnp.float32)
    val = xs[lo] * (1.0 - frac) + xs[hi] * frac
    return jnp.where(n > 0, val, 0.0)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return masked_percentile(x, mask, 50.0)
