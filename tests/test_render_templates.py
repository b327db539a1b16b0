"""Tests: PLY I/O roundtrips, mesh sampling, point-splat depth rendering
(incl. occlusion), template DB generation + disk cache contract."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.render import TriangleMesh, render_depth, render_shaded
from poseestimator_tpu.templates import load_templates, render_templates
from poseestimator_tpu.utils import read_ply, write_ply


def box_mesh(sx=0.1, sy=0.06, sz=0.04, center=(0.0, 0.0, 0.0)):
    """Axis-aligned box TriangleMesh (12 triangles)."""
    c = np.asarray(center, np.float32)
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    corners = np.array(
        [[sx_ * hx, sy_ * hy, sz_ * hz] for sx_ in (-1, 1) for sy_ in (-1, 1) for sz_ in (-1, 1)],
        np.float32,
    ) + c
    # faces with outward orientation (index bits: x*4 + y*2 + z)
    quads = [
        (0, 1, 3, 2),  # -x
        (6, 7, 5, 4),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    faces = []
    for a, b, cc, d in quads:
        faces += [[a, b, cc], [a, cc, d]]
    return TriangleMesh(vertices=corners, faces=np.asarray(faces, np.int32))


class TestPlyIO:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip_points(self, tmp_path, rng, binary):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        cols = rng.random((50, 3)).astype(np.float32)
        nrm = rng.normal(size=(50, 3)).astype(np.float32)
        p = str(tmp_path / "t.ply")
        write_ply(p, pts, colors=cols, normals=nrm, binary=binary)
        back = read_ply(p)
        np.testing.assert_allclose(back.vertices, pts, atol=1e-6)
        np.testing.assert_allclose(back.colors, cols, atol=1 / 255.0 + 1e-6)
        np.testing.assert_allclose(back.normals, nrm, atol=1e-6)

    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip_mesh(self, tmp_path, binary):
        m = box_mesh()
        p = str(tmp_path / "m.ply")
        write_ply(p, m.vertices, faces=m.faces, binary=binary)
        back = read_ply(p)
        np.testing.assert_allclose(back.vertices, m.vertices, atol=1e-6)
        np.testing.assert_array_equal(back.faces, m.faces)


class TestMesh:
    def test_load_and_bounds(self, tmp_path):
        m = box_mesh(0.2, 0.1, 0.05, center=(1, 2, 3))
        p = str(tmp_path / "m.ply")
        write_ply(p, m.vertices, faces=m.faces)
        loaded = TriangleMesh.load(p)
        np.testing.assert_allclose(loaded.extent, [0.2, 0.1, 0.05], atol=1e-6)
        np.testing.assert_allclose(loaded.get_center(), [1, 2, 3], atol=1e-5)

    def test_surface_sampling_on_surface(self, rng):
        m = box_mesh(0.2, 0.2, 0.2)
        pts, nrm = m.sample_points_uniformly(2000, rng)
        # every sample lies on one of the six faces
        on_face = np.isclose(np.abs(pts), 0.1, atol=1e-5).any(axis=1)
        assert on_face.all()
        # normals are unit axis-aligned
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
        # sampling is roughly uniform across faces (cube: ~1/6 each per axis-pair)
        frac_posx = np.isclose(pts[:, 0], 0.1, atol=1e-5).mean()
        assert 0.1 < frac_posx < 0.25


class TestRenderDepth:
    def test_plane_depth(self, rng):
        # dense plane at z=2 fills the image with depth 2
        xy = rng.uniform(-2, 2, size=(200_000, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((len(xy), 1), 2.0, np.float32)], axis=1)
        intr = g3.Intrinsics.from_fov(60.0, 64, 48)
        d = render_depth(jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.eye(4), intr)
        d = np.asarray(d)
        assert (d > 0).mean() > 0.99
        np.testing.assert_allclose(d[d > 0], 2.0, atol=1e-3)

    def test_occlusion(self, rng):
        # small near square occludes the far plane in the image center
        far_xy = rng.uniform(-2, 2, size=(100_000, 2)).astype(np.float32)
        far_pts = np.concatenate([far_xy, np.full((len(far_xy), 1), 3.0, np.float32)], 1)
        near_xy = rng.uniform(-0.1, 0.1, size=(50_000, 2)).astype(np.float32)
        near_pts = np.concatenate([near_xy, np.full((len(near_xy), 1), 1.0, np.float32)], 1)
        pts = np.concatenate([far_pts, near_pts])
        intr = g3.Intrinsics.from_fov(60.0, 64, 48)
        d = np.asarray(
            render_depth(jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.eye(4), intr)
        )
        cx, cy = 32, 24
        assert abs(d[cy, cx] - 1.0) < 1e-3  # near square wins at center
        assert abs(d[0, 0] - 3.0) < 1e-3  # far plane at the corner

    def test_vsd_metric(self, rng):
        from poseestimator_tpu.render import vsd_metric

        # compact square patch at z=2 in front of a 64x48 camera
        xy = rng.uniform(-0.3, 0.3, size=(60_000, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((len(xy), 1), 2.0, np.float32)], axis=1)
        pts = jnp.asarray(pts)
        valid = jnp.ones(len(pts), bool)
        intr = g3.Intrinsics.from_fov(60.0, 64, 48)
        I = jnp.eye(4)
        # identical poses -> zero discrepancy
        assert float(vsd_metric(I, I, pts, valid, intr, tau=0.02)) < 1e-6
        # depth offset below tau, same silhouette scale-change is tiny -> low
        T_near = np.eye(4, dtype=np.float32)
        T_near[2, 3] = 0.01
        e_small = float(vsd_metric(jnp.asarray(T_near), I, pts, valid, intr, tau=0.02))
        assert e_small < 0.2
        # depth offset far beyond tau -> every intersecting pixel mismatches
        T_far = np.eye(4, dtype=np.float32)
        T_far[2, 3] = 0.5
        e_big = float(vsd_metric(jnp.asarray(T_far), I, pts, valid, intr, tau=0.02))
        assert e_big > 0.9
        # occlusion-aware visibility: a scene surface in front of the object
        # hides it in both poses -> metric must go to 0 (nothing visible)
        occluder = jnp.full((48, 64), 1.0)
        e_occ = float(
            vsd_metric(I, I, pts, valid, intr, tau=0.02, scene_depth=occluder)
        )
        assert e_occ == 0.0

    def test_vsd_multi_tau_matches_single(self, rng):
        # the sweep variant renders once; each column must equal the
        # single-tau metric, and VSD must be non-increasing in tau
        from poseestimator_tpu.render import vsd_metric, vsd_multi_tau

        xy = rng.uniform(-0.3, 0.3, size=(40_000, 2)).astype(np.float32)
        pts = jnp.asarray(
            np.concatenate([xy, np.full((len(xy), 1), 2.0, np.float32)], axis=1)
        )
        valid = jnp.ones(pts.shape[0], bool)
        intr = g3.Intrinsics.from_fov(60.0, 64, 48)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.04
        T[2, 3] = 0.03
        taus = jnp.asarray([0.005, 0.02, 0.08], jnp.float32)
        sweep = np.asarray(
            vsd_multi_tau(jnp.asarray(T), jnp.eye(4), pts, valid, intr, taus)
        )
        for i, tau in enumerate([0.005, 0.02, 0.08]):
            single = float(
                vsd_metric(jnp.asarray(T), jnp.eye(4), pts, valid, intr, tau=tau)
            )
            assert abs(sweep[i] - single) < 1e-6
        assert sweep[0] >= sweep[1] >= sweep[2]

    def test_bop_average_recall(self):
        from poseestimator_tpu.utils.bop import BOP_FRACS, bop_average_recall

        assert len(BOP_FRACS) == 10
        # perfect pose: every threshold passes
        perfect = bop_average_recall(
            np.zeros((3, 10)), np.zeros(3), np.zeros(3), diameter=0.1
        )
        assert perfect["bop_ar"] == 1.0
        # hand-computed mid case (values placed between sweep thresholds):
        # vsd 0.22 passes theta in {0.25..0.5} -> 6/10; mssd 0.022 m vs
        # 0.1 m diameter -> 6/10; mspd 12 px vs {5..50} px -> 8/10
        mid = bop_average_recall(
            np.full((2, 10), 0.22), np.full(2, 0.022), np.full(2, 12.0),
            diameter=0.1,
        )
        assert mid["ar_vsd"] == 0.6
        assert mid["ar_mssd"] == 0.6
        assert mid["ar_mspd"] == 0.8
        assert abs(mid["bop_ar"] - (0.6 + 0.6 + 0.8) / 3) < 1e-3
        # MSPD thresholds scale with image width (r = w/640): at w=1280 the
        # same 12 px error passes {20..100} -> 9/10
        wide = bop_average_recall(
            np.full((2, 10), 0.22), np.full(2, 0.022), np.full(2, 12.0),
            diameter=0.1, image_width=1280,
        )
        assert wide["ar_mspd"] == 0.9
        with pytest.raises(ValueError):
            bop_average_recall(
                np.zeros((3, 4)), np.zeros(3), np.zeros(3), diameter=0.1
            )

    def test_render_backproject_roundtrip(self, rng):
        # render a box and back-project: points must lie on the box surface
        m = box_mesh(0.1, 0.08, 0.06)
        pts, nrm = m.sample_points_uniformly(100_000, rng)
        intr = g3.Intrinsics.from_fov(60.0, 160, 120)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0, 0, 0.4]
        d = render_depth(jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(T), intr)
        cloud = g3.backproject_depth(d, intr, depth_min=0.01)
        back = g3.to_numpy(cloud) - np.array([0, 0, 0.4])
        # every back-projected point is within a small tolerance of the surface
        dist_to_surface = np.min(
            np.stack([np.abs(np.abs(back[:, 0]) - 0.05),
                      np.abs(np.abs(back[:, 1]) - 0.04),
                      np.abs(np.abs(back[:, 2]) - 0.03)]), axis=0)
        assert np.percentile(dist_to_surface, 95) < 0.004

    def test_shaded_headlight(self, rng):
        # flat plane facing the camera renders bright; background stays white
        xy = rng.uniform(-0.2, 0.2, size=(50_000, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((len(xy), 1), 1.0, np.float32)], 1)
        nrm = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (len(pts), 1))
        intr = g3.Intrinsics.from_fov(60.0, 64, 48)
        d, rgb = render_shaded(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.ones(len(pts), bool), jnp.eye(4), intr,
        )
        rgb = np.asarray(rgb)
        assert rgb[24, 32, 2] > 0.9  # blue base color, full lambert
        assert np.all(rgb[0, 0] == 1.0)  # background white


class TestTemplates:
    def test_render_templates_contract(self, tmp_path, rng):
        m = box_mesh(100.0, 60.0, 40.0)  # millimeter-scale CAD
        cad = str(tmp_path / "obj_000001.ply")
        write_ply(cad, m.vertices, faces=m.faces)
        out = str(tmp_path / "views")
        written = render_templates(cad, out)
        assert len(written) == 5
        names = sorted(os.listdir(out))
        # artifact contract: pcd_cam_{i:02d}_{type}.ply + rgb pngs
        assert "pcd_cam_00_6.ply" in names and "pcd_cam_04_12.ply" in names
        assert "rgb_00_6.png" in names
        for f in written:
            v = read_ply(f).vertices
            assert 100 < len(v) <= 10_000
            # templates are in world (model) frame: near the box surface, in
            # meters after the mm->m autoscale
            assert np.abs(v).max() < 0.2

    def test_template_on_surface(self, tmp_path, rng):
        m = box_mesh(0.1, 0.06, 0.04)  # already meters
        cad = str(tmp_path / "cad.ply")
        write_ply(cad, m.vertices, faces=m.faces)
        out = str(tmp_path / "views")
        written = render_templates(cad, out)
        v = read_ply(written[0]).vertices
        d = np.min(
            np.stack([np.abs(np.abs(v[:, 0]) - 0.05),
                      np.abs(np.abs(v[:, 1]) - 0.03),
                      np.abs(np.abs(v[:, 2]) - 0.02)]), axis=0)
        assert np.percentile(d, 90) < 0.005

    def test_load_templates_cache(self, tmp_path):
        m = box_mesh(0.1, 0.06, 0.04)
        cad = str(tmp_path / "cad.ply")
        write_ply(cad, m.vertices, faces=m.faces)
        out = str(tmp_path / "views")
        # cold: auto-renders
        db = load_templates(out, cad)
        assert db.count == 5
        mtimes = {f: os.path.getmtime(f) for f in db.paths}
        # warm: cache hit, no re-render
        db2 = load_templates(out, cad)
        assert db2.paths == db.paths
        assert all(os.path.getmtime(f) == mtimes[f] for f in db2.paths)
        c = db2.cloud(0)
        assert int(c.count()) > 100

    def test_load_templates_view_set_mismatch_rerenders(self, tmp_path):
        """Advisor r4: a dir holding the auto-rendered 5-view reduced DB must
        NOT silently satisfy view_set='full' — the sidecar triggers a clean
        re-render (and back again)."""
        m = box_mesh(0.1, 0.06, 0.04)
        cad = str(tmp_path / "cad.ply")
        write_ply(cad, m.vertices, faces=m.faces)
        out = str(tmp_path / "views")
        db = load_templates(out, cad, view_set="reduced")
        assert db.count == 5
        db_full = load_templates(out, cad, view_set="full")
        assert db_full.count == 26
        with open(os.path.join(out, "view_set.txt")) as f:
            assert f.read().strip() == "full"
        db_back = load_templates(out, cad, view_set="reduced")
        assert db_back.count == 5

    def test_load_templates_user_dir_count_mismatch_warns(self, tmp_path):
        """User-supplied template dirs (no sidecar) load as-is, but a count
        that contradicts the requested view set warns instead of no-opping."""
        import warnings

        m = box_mesh(0.1, 0.06, 0.04)
        cad = str(tmp_path / "cad.ply")
        write_ply(cad, m.vertices, faces=m.faces)
        out = tmp_path / "user_views"
        out.mkdir()
        pts = m.sample_points_uniformly(500, np.random.default_rng(0))[0]
        for i in range(3):
            write_ply(str(out / f"tpl_{i}.ply"), pts)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            db = load_templates(str(out), cad, view_set="full")
        assert db.count == 3  # loaded as-is
        assert any("view_set" in str(x.message) for x in w)
