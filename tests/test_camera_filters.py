"""Depth-filter behavior pinned against definition-derived fixtures.

No real librealsense recording is available in this environment (no USB
hardware, zero egress), so the expected outputs are computed by an
INDEPENDENT pure-numpy reference written directly from the published
librealsense filter definitions (spatial: iterative directional 1-D
exponential smoothing with an edge-stop delta; temporal: EMA with hole
persistence; hole filling: farest_from_around). Reference consumption
sites: RealSenseClass.py:21-23,37-39. The numpy reference iterates pixel
by pixel — structurally nothing like the JAX kernels — so agreement pins
the semantics, not the implementation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu.camera.filters import (
    hole_filling_filter,
    spatial_filter,
    temporal_filter,
)


# --- independent numpy references (explicit loops, border-aware) -----------

def np_spatial(depth, alpha=0.5, delta=0.02, iterations=2):
    d = depth.astype(np.float64).copy()
    H, W = d.shape
    for _ in range(iterations):
        for axis in (1, 0):  # rows then columns, matching the kernel's order
            for shift in (1, -1):
                out = d.copy()
                for i in range(H):
                    for j in range(W):
                        if axis == 1:
                            jn = j - shift
                            if jn < 0 or jn >= W:
                                continue
                            nb = d[i, jn]
                        else:
                            iN = i - shift
                            if iN < 0 or iN >= H:
                                continue
                            nb = d[iN, j]
                        cur = d[i, j]
                        if cur > 0 and nb > 0 and abs(cur - nb) <= delta:
                            out[i, j] = alpha * cur + (1 - alpha) * nb
                d = out
    return d.astype(np.float32)


def np_temporal(depth, prev, alpha=0.4, delta=0.02):
    out = np.empty_like(depth)
    H, W = depth.shape
    for i in range(H):
        for j in range(W):
            d, p = depth[i, j], prev[i, j]
            if d <= 0:
                out[i, j] = p  # hole persistence
            elif p > 0 and abs(d - p) <= delta:
                out[i, j] = alpha * d + (1 - alpha) * p
            else:
                out[i, j] = d
    return out


def np_hole_fill(depth, sweeps=2):
    d = depth.astype(np.float64).copy()
    H, W = d.shape
    for _ in range(sweeps):
        out = d.copy()
        for i in range(H):
            for j in range(W):
                if d[i, j] > 0:
                    continue
                cands = []
                if j - 1 >= 0:
                    cands.append(d[i, j - 1])
                if j + 1 < W:
                    cands.append(d[i, j + 1])
                if i - 1 >= 0:
                    cands.append(d[i - 1, j])
                if i + 1 < H:
                    cands.append(d[i + 1, j])
                cands = [c for c in cands if c > 0]
                if cands:
                    out[i, j] = max(cands)  # farest_from_around
        d = out
    return d.astype(np.float32)


def _scene(rng, holes=True):
    """A plausible depth image: smooth ramp + a step edge + holes."""
    H, W = 24, 32
    d = 1.0 + np.linspace(0, 0.1, W)[None, :] + np.linspace(0, 0.05, H)[:, None]
    d = d + rng.normal(size=(H, W)) * 0.003
    d[:, W // 2:] += 0.5  # depth discontinuity the filter must not cross
    if holes:
        mask = rng.random((H, W)) < 0.15
        d[mask] = 0.0
    return d.astype(np.float32)


class TestSpatialFilter:
    def test_matches_reference(self, rng):
        d = _scene(rng)
        got = np.asarray(spatial_filter(jnp.asarray(d)))
        want = np_spatial(d)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_edge_preserved(self, rng):
        d = _scene(rng, holes=False)
        got = np.asarray(spatial_filter(jnp.asarray(d)))
        # the 0.5 m step must survive: values adjacent to the jump move by
        # far less than the step
        jump = got[:, 16].mean() - got[:, 15].mean()
        assert jump > 0.45

    def test_no_border_wraparound(self):
        # first and last column nearly equal: circular neighbors would blend
        # them; a border-aware filter must leave both untouched
        d = np.zeros((4, 8), np.float32)
        d[:, 0] = 1.000
        d[:, -1] = 1.010
        got = np.asarray(spatial_filter(jnp.asarray(d), iterations=1))
        np.testing.assert_allclose(got[:, 0], 1.000, atol=1e-7)
        np.testing.assert_allclose(got[:, -1], 1.010, atol=1e-7)


class TestTemporalFilter:
    def test_matches_reference(self, rng):
        prev = _scene(rng)
        cur = prev + rng.normal(size=prev.shape).astype(np.float32) * 0.004
        cur[rng.random(cur.shape) < 0.1] = 0.0
        got = np.asarray(temporal_filter(jnp.asarray(cur), jnp.asarray(prev)))
        want = np_temporal(cur, prev)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_hole_persistence_and_motion_reset(self):
        prev = np.full((2, 2), 1.5, np.float32)
        cur = np.array([[0.0, 1.51], [2.5, 1.5]], np.float32)
        got = np.asarray(temporal_filter(jnp.asarray(cur), jnp.asarray(prev)))
        assert got[0, 0] == pytest.approx(1.5)       # hole -> previous value
        assert got[0, 1] == pytest.approx(0.4 * 1.51 + 0.6 * 1.5)  # EMA
        assert got[1, 0] == pytest.approx(2.5)       # big motion -> reset
        assert got[1, 1] == pytest.approx(1.5)


class TestHoleFillingFilter:
    def test_matches_reference(self, rng):
        d = _scene(rng)
        got = np.asarray(hole_filling_filter(jnp.asarray(d)))
        want = np_hole_fill(d)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_fills_with_farthest_neighbor(self):
        d = np.array([[1.0, 0.0, 2.0]], np.float32)
        got = np.asarray(hole_filling_filter(jnp.asarray(d)))
        assert got[0, 1] == pytest.approx(2.0)

    def test_border_hole_not_filled_from_wraparound(self):
        d = np.zeros((1, 4), np.float32)
        d[0, 3] = 3.0
        got = np.asarray(hole_filling_filter(jnp.asarray(d)))
        # two sweeps propagate at most two pixels leftward from column 3;
        # column 0 must stay a hole (circular roll would fill it from the
        # right edge immediately)
        assert got[0, 0] == 0.0
        assert got[0, 1] == pytest.approx(3.0)
