"""Unit tests for the geom3d core: cloud type, SE(3), kNN, sampling, camera,
outliers, metrics — closed-form and numpy-reference checks (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu import geom3d as g3


def make_cloud(rng, n=100, cap=None, scale=1.0):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * scale
    return g3.from_points(pts, capacity=cap), pts


class TestCloud:
    def test_padding_and_count(self, rng):
        c, pts = make_cloud(rng, 50, cap=128)
        assert c.capacity == 128
        assert int(c.count()) == 50
        np.testing.assert_allclose(g3.to_numpy(c), pts, rtol=1e-6)

    def test_centroid_masked(self, rng):
        c, pts = make_cloud(rng, 50, cap=128)
        np.testing.assert_allclose(np.asarray(c.centroid()), pts.mean(0), atol=1e-5)

    def test_transform_roundtrip(self, rng):
        c, pts = make_cloud(rng, 20)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(g3.rot_z(0.3))
        T[:3, 3] = [1, 2, 3]
        c2 = c.transform(jnp.asarray(T)).transform(g3.inv_T(jnp.asarray(T)))
        np.testing.assert_allclose(np.asarray(c2.points), pts, atol=1e-5)

    def test_compact(self, rng):
        c, pts = make_cloud(rng, 60, cap=100)
        keep = np.zeros(100, bool)
        keep[10:40] = True
        c2 = c.mask_where(jnp.asarray(keep))
        cc = g3.compact(c2, 64)
        assert int(cc.count()) == 30
        np.testing.assert_allclose(g3.to_numpy(cc), pts[10:40], rtol=1e-6)

    def test_bounding_box(self, rng):
        c, pts = make_cloud(rng, 50, cap=80)
        lo, hi = g3.bounding_box(c)
        np.testing.assert_allclose(np.asarray(lo), pts.min(0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(hi), pts.max(0), atol=1e-6)


class TestSE3:
    def test_angular_error_zero(self):
        R = np.asarray(g3.rot_x(0.7))
        assert float(g3.angular_error(jnp.asarray(R), jnp.asarray(R))) < 1e-6

    def test_angular_error_known(self):
        a = float(g3.angular_error(jnp.eye(3), g3.rot_y(0.5)))
        assert abs(a - 0.5) < 1e-5

    def test_euler_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation as R

        rpy = rng.uniform(-3, 3, 3)
        ours = np.asarray(g3.euler_xyz_to_R(jnp.asarray(rpy, jnp.float32)))
        theirs = R.from_euler("xyz", rpy).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_random_rotation_orthonormal(self):
        Rm = np.asarray(g3.random_rotation(jax.random.PRNGKey(3)))
        np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(Rm) - 1) < 1e-5

    def test_lookat_maps_eye_to_origin(self):
        T = np.asarray(g3.look_at([0, 0, 2.0], [0, 0, 0], [0, 1, 0]))
        p = T @ np.array([0, 0, 2, 1.0])
        np.testing.assert_allclose(p[:3], 0, atol=1e-6)
        # target ends up on -z axis in front of an OpenGL-style camera
        t = T @ np.array([0, 0, 0, 1.0])
        assert t[2] < 0

    def test_camera_eye_lookat_roundtrip(self):
        # camera 2m away looking at origin: eye recovered from H
        H = np.asarray(g3.look_at([1.0, 0.5, 2.0], [0, 0, 0], [0, 1, 0]))
        # o3d_lookat gives OpenGL convention (camera looks down -z);
        # camera_eye_lookat_up_from_H assumes +z forward (vision convention),
        # so convert: flip y and z rows.
        F = np.diag([1.0, -1.0, -1.0, 1.0])
        eye, target, up = g3.camera_eye_lookat_up_from_H(jnp.asarray(F @ H))
        np.testing.assert_allclose(np.asarray(eye), [1.0, 0.5, 2.0], atol=1e-5)

    def test_upright_snap_identity_when_ok(self):
        # R with +Y axis already near world -Y
        R = np.diag([1.0, -1.0, -1.0])
        T = np.eye(4)
        T[:3, :3] = R
        out = np.asarray(g3.enforce_upright_pose_y_up(jnp.asarray(T, jnp.float32)))
        np.testing.assert_allclose(out, T, atol=1e-6)

    def test_upright_snap_rotates(self):
        # column-1 = +X -> after one Rz90 (R @ Rz), col1 becomes -? try all
        T = np.eye(4, dtype=np.float32)
        out = np.asarray(g3.enforce_upright_pose_y_up(jnp.asarray(T)))
        # identity has up_local=+Y, cos = -1*1 = -1 -> not ok.
        # R@Rz column1 = R @ (-1,0,0) = -X -> cos 0; R@Rz^2 col1 = -Y -> cos +1?
        # world_up=(0,-1,0): col1=-Y gives dot (0,-1,0).(0,-1,0)=1 -> ok
        up = out[:3, 1]
        assert np.dot(up, [0, -1, 0]) > np.cos(np.deg2rad(30))

    def test_pca_prealign_recovers_rotation(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32) * np.array([3.0, 1.5, 0.5])
        src = g3.from_points(pts)
        Rt = np.asarray(g3.rot_z(0.4) @ g3.rot_x(0.2))
        t = np.array([0.3, -0.2, 0.9], np.float32)
        dst = g3.from_points(pts @ Rt.T + t)
        T0 = np.asarray(g3.initial_align_centroid_pca(src, dst))
        moved = pts @ T0[:3, :3].T + T0[:3, 3]
        err = np.abs(moved - (pts @ Rt.T + t)).mean()
        assert err < 1e-3


class TestKNN:
    def test_matches_scipy(self, rng):
        from scipy.spatial import cKDTree

        a = rng.normal(size=(60, 3)).astype(np.float32)
        b = rng.normal(size=(80, 3)).astype(np.float32)
        ca, cb = g3.from_points(a, 64), g3.from_points(b, 96)
        d, idx, ok = g3.knn(ca.points, ca.valid, cb.points, cb.valid, k=5)
        tree = cKDTree(b)
        dd, ii = tree.query(a, k=5)
        np.testing.assert_allclose(np.asarray(d)[:60], dd, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx)[:60], ii)

    def test_exclude_self(self, rng):
        a = rng.normal(size=(30, 3)).astype(np.float32)
        c = g3.from_points(a)
        d, idx, ok = g3.knn(c.points, c.valid, c.points, c.valid, k=3, exclude_self=True)
        assert not np.any(np.asarray(idx) == np.arange(30)[:, None])

    def test_padding_not_neighbors(self, rng):
        a = rng.normal(size=(10, 3)).astype(np.float32)
        c = g3.from_points(a, capacity=32)
        d, idx, ok = g3.knn(c.points, c.valid, c.points, c.valid, k=15, exclude_self=True)
        # only 9 real neighbors exist per valid point
        assert np.all(np.asarray(ok).sum(1)[:10] == 9)


class TestMasked:
    def test_percentile_matches_numpy(self, rng):
        x = rng.normal(size=(100,)).astype(np.float32)
        mask = rng.random(100) < 0.7
        for q in [0, 25, 50, 90, 100]:
            ours = float(g3.masked_percentile(jnp.asarray(x), jnp.asarray(mask), q))
            ref = float(np.percentile(x[mask], q))
            assert abs(ours - ref) < 1e-4, q


class TestSampling:
    def test_random_sample_counts(self, rng):
        c, _ = make_cloud(rng, 100, cap=128)
        s = g3.random_sample(jax.random.PRNGKey(0), c, 40)
        assert int(s.count()) == 40
        # sampled points are real points
        orig = {tuple(np.round(p, 5)) for p in g3.to_numpy(c)}
        assert all(tuple(np.round(p, 5)) in orig for p in g3.to_numpy(s))

    def test_random_sample_fewer_valid(self, rng):
        c, _ = make_cloud(rng, 10, cap=32)
        s = g3.random_sample(jax.random.PRNGKey(0), c, 20)
        assert int(s.count()) == 10

    def test_stratified_sample_raster_clustered_mask(self, rng):
        # The advisor-flagged failure mode of the old approx_max_k path: a
        # compact detection mask over a 640-px-stride raster buffer clusters
        # valid points into contiguous runs whose stride shares factors with
        # power-of-2 bin counts. The exact stratified sampler must return
        # EXACTLY min(count, n) valid points regardless of clustering.
        W, H = 640, 480
        cap = W * H
        valid = np.zeros(cap, bool)
        # a dense 160x140 object block: 22400 valid points, raster-clustered
        for r in range(200, 340):
            valid[r * W + 240 : r * W + 400] = True
        pts = rng.normal(size=(cap, 3)).astype(np.float32)
        c = g3.PointCloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
        for n in (16384, 4096, 100):
            s = g3.random_sample(jax.random.PRNGKey(3), c, n)
            assert int(s.count()) == min(int(valid.sum()), n), n
            # no duplicates, all real points
            sel = np.asarray(s.points)[np.asarray(s.valid)]
            uniq = {tuple(np.round(p, 5)) for p in sel}
            assert len(uniq) == len(sel)

    def test_stratified_sample_keeps_all_when_short(self, rng):
        # count < n through the large-pool path: every valid point kept once
        cap, n_valid, n = 40960, 3000, 4096
        valid = np.zeros(cap, bool)
        valid[5000 : 5000 + n_valid] = True  # one contiguous cluster
        pts = rng.normal(size=(cap, 3)).astype(np.float32)
        c = g3.PointCloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
        s = g3.random_sample(jax.random.PRNGKey(4), c, n)
        assert int(s.count()) == n_valid
        sel = np.asarray(s.points)[np.asarray(s.valid)]
        assert len({tuple(np.round(p, 5)) for p in sel}) == n_valid

    def test_stratified_sample_spatially_unbiased(self, rng):
        # The round-1 "drift" class: raster-order truncation keeps the image
        # TOP. The sampler must select uniformly along the raster axis —
        # first-half vs second-half selection rates within a few percent.
        cap, n = 65536, 8192
        valid = np.ones(cap, bool)
        pts = np.zeros((cap, 3), np.float32)
        pts[:, 0] = np.arange(cap) / cap  # x encodes raster position
        c = g3.PointCloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
        s = g3.random_sample(jax.random.PRNGKey(5), c, n)
        xs = np.asarray(s.points)[np.asarray(s.valid), 0]
        frac_top = float(np.mean(xs < 0.5))
        assert abs(frac_top - 0.5) < 0.05
        # mean position is centered, not biased toward the buffer head
        assert abs(float(xs.mean()) - 0.5) < 0.02

    def test_stratified_sample_exact_count_key_sweep(self, rng):
        # Integer-mark exactness: the old float32 floor(C*f + u) marks could
        # round across an integer for large cumsums and lose one slot when
        # the tail bins were starved (probability ~1e-3 per draw — a key
        # sweep makes it observable). The modular-prefix-scan marks must be
        # exact for EVERY key. Layout stresses the failure mode: big pool,
        # all-invalid tail, awkward (non-power-of-2) valid count.
        cap = 307200  # 640x480 raster
        valid = np.zeros(cap, bool)
        valid[1000:24371] = True  # 23371 valid, long starved tail
        pts = rng.normal(size=(cap, 3)).astype(np.float32)
        c = g3.PointCloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
        sample = jax.jit(lambda k: g3.random_sample(k, c, 16384).count())
        counts = {int(sample(jax.random.PRNGKey(k))) for k in range(64)}
        assert counts == {16384}, counts

    def test_fps_spreads(self, rng):
        # FPS on a unit segment: min pairwise gap of n samples is >= OPT/2
        # (greedy farthest-point 2-approximation of the k-center spread).
        pts = np.stack([np.linspace(0, 1, 50), np.zeros(50), np.zeros(50)], 1).astype(np.float32)
        c = g3.from_points(pts)
        n = 5
        s = g3.farthest_point_sampling(jax.random.PRNGKey(1), c, n)
        xs = np.sort(g3.to_numpy(s)[:, 0])
        min_gap = np.diff(xs).min()
        assert min_gap >= 1.0 / (2 * (n - 1)) - 1e-6
        # second sample is always an extreme point relative to the start
        s2 = g3.farthest_point_sampling(jax.random.PRNGKey(2), c, 2)
        xs2 = g3.to_numpy(s2)[:, 0]
        assert min(xs2) < 0.02 or max(xs2) > 0.98

    def test_voxel_down_sample(self, rng):
        pts = np.array(
            [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.5, 0.5, 0.5]], np.float32
        )
        c = g3.from_points(pts, capacity=8)
        v = g3.voxel_down_sample(c, 0.1)
        assert int(v.count()) == 2
        out = g3.to_numpy(v)
        # one voxel is the average of the two close points
        assert np.any(np.all(np.isclose(out, [0.015, 0.015, 0.015], atol=1e-6), axis=1))

    def test_voxel_coverage(self):
        pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 0, 0], [2.5, 0, 0]], np.float32)
        c = g3.from_points(pts, capacity=8)
        cov = int(g3.voxel_coverage(c.points, c.valid, 1.0))
        assert cov == 3


class TestCamera:
    def test_backproject_project_roundtrip(self):
        intr = g3.Intrinsics.from_fov(60.0, 64, 48)
        depth = np.full((48, 64), 2.0, np.float32)
        cloud = g3.backproject_depth(jnp.asarray(depth), intr)
        assert int(cloud.count()) == 48 * 64
        uv, front = g3.project_points(cloud.points, jnp.asarray(intr.K), jnp.eye(4))
        assert bool(jnp.all(front))
        u = np.asarray(uv[:, 0]).reshape(48, 64)
        v = np.asarray(uv[:, 1]).reshape(48, 64)
        np.testing.assert_allclose(u, np.arange(64)[None, :].repeat(48, 0), atol=1e-3)
        np.testing.assert_allclose(v, np.arange(48)[:, None].repeat(64, 1), atol=1e-3)

    def test_mask_and_clip(self):
        intr = g3.Intrinsics.from_fov(60.0, 8, 8)
        depth = np.ones((8, 8), np.float32)
        depth[0, 0] = 0.0
        depth[0, 1] = 100.0
        mask = np.ones((8, 8), np.uint8)
        mask[1, 1] = 0
        c = g3.backproject_depth(
            jnp.asarray(depth), intr, mask=jnp.asarray(mask), depth_min=0.01, depth_max=10.0
        )
        assert int(c.count()) == 64 - 3

    def test_distorted_matches_cv2(self, rng):
        import cv2

        pts = rng.normal(size=(50, 3)).astype(np.float32)
        pts[:, 2] += 5.0
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        D = np.array([0.1, -0.05, 0.001, 0.002, 0.01], np.float32)
        uv_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, D)
        uv_cv = uv_cv.reshape(-1, 2)
        uv, front = g3.project_points_distorted(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(D), jnp.eye(4)
        )
        np.testing.assert_allclose(np.asarray(uv), uv_cv, atol=1e-2)


class TestOutliersMetrics:
    def test_outlier_removal(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32) * 0.1
        pts[0] = [10, 10, 10]  # gross outlier
        c = g3.from_points(pts)
        c2 = g3.remove_statistical_outlier(c, nb_neighbors=20, std_ratio=1.0)
        assert not bool(c2.valid[0])
        assert int(c2.count()) > 80

    def test_chamfer_zero_on_identical(self, rng):
        c, _ = make_cloud(rng, 50, cap=64)
        assert float(g3.chamfer_distance(c, c)) < 1e-6

    def test_chamfer_symmetric_translation(self, rng):
        c, pts = make_cloud(rng, 50)
        c2 = g3.from_points(pts + np.array([10.0, 0, 0], np.float32))
        d = float(g3.chamfer_distance(c, c2))
        assert d > 1.0  # both directions contribute

    def test_alignment_score_better_when_aligned(self, rng):
        c, pts = make_cloud(rng, 200, scale=0.3)
        shifted = g3.from_points(pts + 0.2)
        s_good = float(g3.alignment_score(c, c, c, 0.05))
        s_bad = float(g3.alignment_score(shifted, c, c, 0.05))
        assert s_good < s_bad
        assert s_good < 1e-5

    def test_cloud_resolution_grid(self):
        # unit grid -> nearest neighbors at distance 1
        xs = np.arange(5, dtype=np.float32)
        pts = np.stack(np.meshgrid(xs, xs, xs), -1).reshape(-1, 3)
        c = g3.from_points(pts)
        r = float(g3.cloud_resolution(c, k=3))
        assert abs(r - 1.0) < 1e-5

    def test_add_metric(self, rng):
        c, _ = make_cloud(rng, 50)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, 3] = [0.1, 0, 0]
        add = float(g3.add_metric(jnp.asarray(T2), jnp.asarray(T1), c))
        assert abs(add - 0.1) < 1e-5
        adds = float(g3.adds_metric(jnp.asarray(T1), jnp.asarray(T1), c))
        assert adds < 1e-6

    def test_mssd_metric(self, rng):
        # pure translation: every point moves by |t| -> max distance = |t|
        c, _ = make_cloud(rng, 50)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, 3] = [0.03, 0.04, 0.0]
        m = float(g3.mssd_metric(jnp.asarray(T2), jnp.asarray(T1), c))
        assert abs(m - 0.05) < 1e-5
        # a 180-degree z-symmetry absorbs a 180-degree z-rotation error
        Rz = np.eye(4, dtype=np.float32)
        Rz[:3, :3] = np.asarray(g3.rot_z(np.pi))
        syms = jnp.stack([jnp.eye(4), jnp.asarray(Rz)])
        m_wrong = float(g3.mssd_metric(jnp.asarray(T1 @ Rz), jnp.asarray(T1), c))
        m_sym = float(
            g3.mssd_metric(jnp.asarray(T1 @ Rz), jnp.asarray(T1), c, syms)
        )
        assert m_wrong > 0.01 and m_sym < 1e-5

    def test_mspd_metric(self, rng):
        # camera 1 m in front; a lateral shift of fx*dx/z pixels
        pts = rng.uniform(-0.05, 0.05, size=(60, 3)).astype(np.float32)
        c = g3.from_points(pts)
        K = jnp.asarray(
            [[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]], jnp.float32
        )
        T1 = np.eye(4, dtype=np.float32)
        T1[2, 3] = 1.0
        T2 = T1.copy()
        T2[0, 3] += 0.01  # 1 cm lateral at z~1 m -> ~5 px
        m = float(g3.mspd_metric(jnp.asarray(T2), jnp.asarray(T1), K, c))
        z_min = 1.0 + pts[:, 2].min()
        expected = 500.0 * 0.01 / z_min
        assert abs(m - expected) < 0.2
        # identical poses -> zero reprojection error
        assert float(g3.mspd_metric(jnp.asarray(T1), jnp.asarray(T1), K, c)) < 1e-4


class TestNormalsFPFH:
    def test_plane_normals(self, rng):
        pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
        pts[:, 2] = 0.0
        c = g3.from_points(pts)
        c = g3.estimate_normals(c, radius=0.5, max_nn=30, orient_towards=jnp.array([0.0, 0, 5.0]))
        n = np.asarray(c.normals)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
        assert np.all(n[:, 2] > 0)  # oriented toward viewpoint at +z

    def test_sphere_normals_radial(self, rng):
        v = rng.normal(size=(500, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        c = g3.from_points(v.astype(np.float32))
        c = g3.estimate_normals(c, radius=0.4, max_nn=30, orient_towards=jnp.zeros(3))
        n = np.asarray(c.normals)
        # normals should be parallel to radius (oriented inward, toward origin)
        cosang = np.abs(np.sum(n * v, axis=1))
        assert np.percentile(cosang, 10) > 0.95

    def test_fpfh_invariant_to_rigid_motion(self, rng):
        # orient normals toward each cloud's centroid: a rigid-equivariant
        # sign choice, so FPFH must be invariant (raw eigh signs are not)
        pts = rng.normal(size=(150, 3)).astype(np.float32) * np.array([1.0, 0.6, 0.3], np.float32)
        c1 = g3.from_points(pts)
        c1 = g3.estimate_normals(c1, radius=0.5, max_nn=30, orient_towards=jnp.asarray(pts.mean(0)))
        f1, _ = g3.compute_fpfh(c1, radius=0.8, max_nn=50)

        R = np.asarray(g3.rot_z(0.7) @ g3.rot_x(0.3))
        pts2 = pts @ R.T + np.array([1, 2, 3], np.float32)
        c2 = g3.from_points(pts2)
        c2 = g3.estimate_normals(c2, radius=0.5, max_nn=30, orient_towards=jnp.asarray(pts2.mean(0)))
        f2, _ = g3.compute_fpfh(c2, radius=0.8, max_nn=50)
        # FPFH is rigid-invariant up to normal-sign flips; compare per point
        diff = np.abs(np.asarray(f1) - np.asarray(f2)).mean()
        scale = np.abs(np.asarray(f1)).mean()
        assert diff < 0.15 * scale

    def test_fpfh_discriminates(self, rng):
        # corner points vs plane points should have different signatures
        plane = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        plane[:, 2] = 0
        sphere = rng.normal(size=(100, 3))
        sphere = (sphere / np.linalg.norm(sphere, axis=1, keepdims=True)).astype(np.float32)
        cp = g3.estimate_normals(g3.from_points(plane), radius=0.4, max_nn=30)
        cs = g3.estimate_normals(g3.from_points(sphere), radius=0.4, max_nn=30)
        fp, _ = g3.compute_fpfh(cp, radius=0.6, max_nn=50)
        fs, _ = g3.compute_fpfh(cs, radius=0.6, max_nn=50)
        assert np.abs(np.asarray(fp).mean(0) - np.asarray(fs).mean(0)).sum() > 10.0
