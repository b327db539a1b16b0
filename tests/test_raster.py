"""Triangle-rasterizer correctness: analytic closed-form depth parity
(cube face, slanted plane, sphere), backend agreement (pallas-interpret vs
xla), window rasterization, and degenerate/padded-face handling.

The VERDICT round-3 'done' bar: depth parity vs analytic cube/sphere < 1 mm.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.render.mesh import (
    TriangleMesh,
    make_icosphere,
    pad_faces,
    simplify_vertex_clustering,
)
from poseestimator_tpu.render.raster import render_depth_mesh

from helpers import box_mesh

INTR = g3.Intrinsics(fx=300.0, fy=300.0, cx=80.0, cy=60.0, width=160, height=120)


def _raster(mesh, T, intr=INTR, **kw):
    return np.asarray(
        render_depth_mesh(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(T, jnp.float32), intr, backend="xla", **kw
        )
    )


class TestAnalyticParity:
    def test_cube_front_face_exact_plane(self):
        """Axis-aligned cube facing the camera: every covered pixel of the
        front face lies on the z = z0 plane exactly."""
        mesh = box_mesh(0.2, 0.2, 0.2)
        z_center = 0.6
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = z_center
        d = _raster(mesh, T)
        z0 = z_center - 0.1
        cov = d > 0
        assert cov.sum() > 500
        np.testing.assert_allclose(d[cov], z0, atol=1e-4)
        # analytic silhouette: |x| <= 0.1 at depth z0 -> half-width in px
        half_u = 0.1 / z0 * INTR.fx
        us = np.where(cov.any(0))[0]
        assert abs((us.min() - INTR.cx) + half_u) <= 1.0
        assert abs((us.max() - INTR.cx) - half_u) <= 1.0

    def test_slanted_plane_linear_interpolation(self):
        """A single slanted quad: rasterized depth equals the analytic plane
        depth (perspective-correct 1/z interpolation is exact for planes)."""
        # plane z = 0.5 + 0.3 x + 0.2 y over x,y in [-0.2, 0.2]
        xy = np.array([[-0.2, -0.2], [0.2, -0.2], [0.2, 0.2], [-0.2, 0.2]], np.float32)
        vz = 0.5 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]
        v = np.concatenate([xy, vz[:, None]], axis=1).astype(np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh = TriangleMesh(vertices=v, faces=f)
        d = _raster(mesh, np.eye(4, dtype=np.float32))
        cov = d > 0
        assert cov.sum() > 1000
        vv, uu = np.nonzero(cov)
        # ray through (u, v): x = (u-cx) z / fx, y = (v-cy) z / fy; solve
        # z = 0.5 + 0.3 x + 0.2 y  ->  z (1 - 0.3 ru - 0.2 rv) = 0.5
        ru = (uu - INTR.cx) / INTR.fx
        rv = (vv - INTR.cy) / INTR.fy
        z_true = 0.5 / (1.0 - 0.3 * ru - 0.2 * rv)
        np.testing.assert_allclose(d[cov], z_true, atol=2e-4)

    def test_sphere_depth_sub_mm(self):
        """Icosphere vs closed-form ray-sphere depth: < 1 mm away from
        grazing incidence (tessellation sagitta ~ 0.2 mm at 4 subdivisions)."""
        r, zc = 0.1, 0.5
        mesh = make_icosphere(radius=r, subdivisions=4)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = zc
        d = _raster(mesh, T)
        cov = d > 0
        assert cov.sum() > 2000
        vv, uu = np.nonzero(cov)
        ru = (uu - INTR.cx) / INTR.fx
        rv = (vv - INTR.cy) / INTR.fy
        # ray p = t*(ru, rv, 1), sphere |p - (0,0,zc)| = r
        a = ru**2 + rv**2 + 1.0
        b = -2.0 * zc
        c = zc**2 - r**2
        disc = b * b - 4 * a * c
        hit = disc > 0
        t_near = (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a)
        z_true = t_near  # depth = z component = t * 1
        # incidence: cos angle between ray dir and surface normal at hit
        p = t_near[:, None] * np.stack([ru, rv, np.ones_like(ru)], axis=1)
        n = (p - np.array([0, 0, zc])) / r
        raydir = np.stack([ru, rv, np.ones_like(ru)], axis=1)
        raydir /= np.linalg.norm(raydir, axis=1, keepdims=True)
        cosang = -np.sum(n * raydir, axis=1)
        interior = hit & (cosang > 0.3)
        assert interior.sum() > 1500
        err = np.abs(d[cov][interior] - z_true[interior])
        assert err.max() < 1e-3, f"max sphere depth error {err.max()*1000:.2f} mm"
        # and the splat renderer is measurably worse on the same scene — the
        # raster upgrade's whole point (VERDICT round-3 item 1)
        from poseestimator_tpu.render.points import render_depth

        pts, _ = mesh.sample_points_uniformly(20000, np.random.default_rng(0))
        d_splat = np.asarray(
            render_depth(jnp.asarray(pts), jnp.ones(len(pts), bool),
                         jnp.asarray(T), INTR)
        )
        splat_vals = d_splat[cov][interior]
        has_splat = splat_vals > 0
        err_splat = np.abs(splat_vals[has_splat] - z_true[interior][has_splat])
        assert np.percentile(err_splat, 90) > 5 * err.max()


class TestBackendParity:
    @pytest.mark.parametrize("mesh_fn", [
        lambda: box_mesh(0.15, 0.1, 0.08),
        lambda: make_icosphere(0.08, 2),
    ])
    def test_pallas_interpret_matches_xla(self, mesh_fn):
        mesh = mesh_fn()
        R = np.asarray(g3.random_rotation(jax.random.PRNGKey(5)))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[2, 3] = 0.55
        d_x = _raster(mesh, T)
        d_p = np.asarray(
            render_depth_mesh(
                jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                jnp.asarray(T), INTR, backend="pallas_interpret",
            )
        )
        np.testing.assert_allclose(d_p, d_x, atol=1e-6)

    def test_window_matches_full_crop(self):
        mesh = box_mesh(0.12, 0.12, 0.12)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.5
        full = _raster(mesh, T)
        win = np.asarray(
            render_depth_mesh(
                jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                jnp.asarray(T), INTR, backend="xla",
                origin=jnp.asarray([40.0, 20.0]), out_hw=(64, 64),
            )
        )
        np.testing.assert_allclose(win, full[20:84, 40:104], atol=1e-6)


class TestRobustness:
    def test_padded_faces_are_inert(self):
        mesh = box_mesh(0.1, 0.1, 0.1)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.5
        d0 = _raster(mesh, T)
        padded = TriangleMesh(
            vertices=mesh.vertices, faces=pad_faces(mesh.faces, 64)
        )
        np.testing.assert_allclose(_raster(padded, T), d0, atol=0)

    def test_behind_camera_faces_dropped(self):
        mesh = box_mesh(0.1, 0.1, 0.1)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = -1.0  # fully behind
        assert (_raster(mesh, T) == 0).all()

    def test_hidden_surface_removal(self):
        """Back faces of a closed box never win the z-buffer."""
        mesh = box_mesh(0.2, 0.2, 0.2)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.7
        d = _raster(mesh, T)
        cov = d > 0
        assert (d[cov] <= 0.6 + 1e-4).all()  # front face plane

    def test_simplify_vertex_clustering_preserves_shape(self):
        mesh = make_icosphere(0.1, 4)
        dec = simplify_vertex_clustering(mesh, 0.02)
        assert len(dec.faces) < len(mesh.faces) // 4
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.5
        d_full = _raster(mesh, T)
        d_dec = _raster(dec, T)
        both = (d_full > 0) & (d_dec > 0)
        assert both.sum() > 0.85 * (d_full > 0).sum()
        # decimation error concentrates at silhouette edges; bulk must stay
        # within the clustering voxel
        assert np.percentile(np.abs(d_full - d_dec)[both], 95) < 0.01


class TestRasterAssets:
    def test_decimate_to_faces_budget_and_shape(self):
        from poseestimator_tpu.render.mesh import decimate_to_faces

        mesh = make_icosphere(0.1, 4)  # 5120 faces
        dec = decimate_to_faces(mesh, 1000)
        assert 0 < len(dec.faces) <= 1000
        # small meshes pass through untouched
        small = box_mesh(0.1, 0.1, 0.1)
        assert decimate_to_faces(small, 1000) is small
        # the decimated render must still cover most of the full render
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.5
        d_full, d_dec = _raster(mesh, T), _raster(dec, T)
        both = (d_full > 0) & (d_dec > 0)
        assert both.sum() > 0.8 * (d_full > 0).sum()

    def test_shade_depth_image_contract(self):
        """White background, base-color foreground shaded by screen-space
        normals: a camera-facing plane shades brightest (lambert ~ 1)."""
        from poseestimator_tpu.render.raster import shade_depth_image

        mesh = box_mesh(0.2, 0.2, 0.2)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.6
        d = jnp.asarray(_raster(mesh, T))
        rgb = np.asarray(shade_depth_image(d, INTR, base_color=(0.0, 0.0, 1.0)))
        assert rgb.shape == (INTR.height, INTR.width, 3)
        bg = np.asarray(d) == 0
        np.testing.assert_allclose(rgb[bg], 1.0, atol=0)
        fg = ~bg
        # base color blue: R and G channels carry no color on the object
        assert (rgb[fg][:, 0] == 0).all() and (rgb[fg][:, 1] == 0).all()
        # interior of the camera-facing front face: normal = -z -> lambert 1
        iv, iu = np.where(fg)
        interior = fg.copy()
        interior[:] = False
        interior[iv.min() + 3:iv.max() - 2, iu.min() + 3:iu.max() - 2] = True
        interior &= fg
        assert np.percentile(rgb[interior][:, 2], 50) > 0.95
