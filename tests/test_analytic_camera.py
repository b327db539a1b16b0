"""Closed-form ray-cast observation instrument (camera/analytic.py):
cross-instrument depth parity against the triangle raster, and the
eval_tracking --observation analytic lane.

The analytic caster shares NO code with the render stack, so agreement
between the two on the same scene validates BOTH instruments' conventions
(pixel centers, depth = camera z) — the correlated-error channel VERDICT r4
missing-3 called out.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import l_shape_mesh

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.camera.analytic import (
    l_shape_boxes,
    make_lshape_raycaster,
    raycast_boxes_depth,
)
from poseestimator_tpu.render.raster import render_depth_mesh

INTR = g3.Intrinsics.from_fov(60.0, 160, 120)
_GL_TO_CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def _pose(angle=0.2, dist=2.0, dirv=(1.0, 1.0, 1.0)):
    d = np.asarray(dirv, np.float64)
    d /= np.linalg.norm(d)
    T_gl = np.asarray(g3.look_at(d * dist, [0, 0, 0], [0, 1, 0]))
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.asarray(g3.rot_z(angle) @ g3.rot_x(angle * 0.7))
    return (P @ (_GL_TO_CV @ T_gl)).astype(np.float32)


class TestRaycastVsRaster:
    @pytest.mark.parametrize("angle,dist", [(0.2, 2.0), (0.9, 1.6), (0.5, 2.8)])
    def test_depth_parity_on_l_shape(self, angle, dist):
        """The L-shape mesh is exactly the union of the two analytic boxes,
        so raster depth and ray-cast depth must agree to fp-level everywhere
        away from silhouette edges — with completely independent code paths.
        """
        mesh = l_shape_mesh()
        T = _pose(angle, dist)
        d_raster = np.asarray(render_depth_mesh(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(T), INTR, backend="xla", near=0.01, far=10.0))
        d_ray = raycast_boxes_depth(INTR, T, l_shape_boxes())
        cov_r, cov_a = d_raster > 0, d_ray > 0
        assert cov_r.sum() > 400
        # silhouettes agree except at edge pixels (different inside tests at
        # exactly-boundary samples)
        disagree = cov_r ^ cov_a
        assert disagree.sum() <= 0.02 * cov_r.sum(), disagree.sum()
        both = cov_r & cov_a
        # interior: erode the common coverage so edge pixels (where a ray
        # can hit a different face than the raster's winning triangle at
        # grazing incidence) don't dominate
        interior = both.copy()
        interior[1:] &= both[:-1]
        interior[:-1] &= both[1:]
        interior[:, 1:] &= both[:, :-1]
        interior[:, :-1] &= both[:, 1:]
        err = np.abs(d_raster - d_ray)[interior]
        assert err.max() < 1e-3, f"max {err.max()*1000:.3f} mm"
        assert np.median(err) < 1e-5

    def test_depth_fn_camera_integration(self):
        from poseestimator_tpu.camera import SyntheticCamera

        T = _pose()
        fn = make_lshape_raycaster(INTR, 1.0)
        cam = SyntheticCamera(
            np.zeros((8, 3), np.float32), np.zeros((8, 3), np.float32),
            [T], INTR, depth_fn=fn,
        )
        rgb = cam.get_rgbd()
        assert rgb is not None
        d = np.asarray(cam.depth)
        np.testing.assert_allclose(d, fn(T), atol=1e-6)
        assert np.asarray(cam.object_mask).sum() == (d > 0).sum()


@pytest.mark.slow
def test_eval_tracking_analytic_observation_lane():
    """tools/eval_tracking.py --observation analytic: the whole pipeline
    scored against the zero-shared-code instrument must hold the same
    accuracy class as the raster-observation lane (BASELINE.md row)."""
    import os
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from tools.eval_tracking import build_parser, run

    rows = run(build_parser().parse_args(
        ["--frames", "20", "--modes", "0", "--observation", "analytic"]
    ), quiet=True)
    assert rows, "analytic lane never tracked"
    r = rows[0]
    assert r["frames_tracked"] >= 15
    # same budget as the bench's dense gate: a shared-convention bug between
    # the raster and backprojection would show up here as a systematic bias
    assert r["adds_mean_cm"] <= 1.5, r
