"""Registration stack tests: Kabsch closed-form, RANSAC on synthetic
transforms + outliers, ICP convergence, TEASER robustness — the property-test
pattern of SURVEY.md section 4 (recover a known random SE(3) from corrupted
correspondences, TEASER++'s own canonical test)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu import registration as reg


def random_T(rng_key):
    R = g3.random_rotation(rng_key)
    t = jax.random.normal(jax.random.fold_in(rng_key, 1), (3,)) * 0.5
    return np.asarray(g3.make_T(R, t))


def pose_errors(T_est, T_gt):
    ang = float(g3.angular_error(jnp.asarray(T_gt[:3, :3]), jnp.asarray(np.asarray(T_est)[:3, :3])))
    trans = float(np.linalg.norm(np.asarray(T_est)[:3, 3] - T_gt[:3, 3]))
    return ang, trans


class TestKabsch:
    def test_exact_recovery(self, rng):
        src = rng.normal(size=(20, 3)).astype(np.float32)
        T = random_T(jax.random.PRNGKey(0))
        dst = src @ T[:3, :3].T + T[:3, 3]
        R, t = reg.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.ones(20))
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-5)

    def test_weights_ignore_outliers(self, rng):
        src = rng.normal(size=(20, 3)).astype(np.float32)
        T = random_T(jax.random.PRNGKey(1))
        dst = src @ T[:3, :3].T + T[:3, 3]
        dst[0] += 100.0  # corrupted pair, weight 0
        w = np.ones(20, np.float32)
        w[0] = 0.0
        R, t = reg.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-5)

    def test_degenerate_returns_identity(self):
        src = jnp.zeros((5, 3))
        R, t = reg.kabsch(src, src, jnp.zeros(5))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_three_point_minimal(self, rng):
        src = rng.normal(size=(3, 3)).astype(np.float32)
        T = random_T(jax.random.PRNGKey(2))
        dst = src @ T[:3, :3].T + T[:3, 3]
        R, t = reg.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.ones(3))
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)

    def test_quest_matches_eigh(self, rng):
        """QUEST closed-form principal eigenvector agrees with LAPACK eigh on
        random weighted noisy problems (the stated purpose of keeping
        method='eigh' as the verification path)."""
        for seed in range(20):
            r = np.random.default_rng(seed)
            n = int(r.integers(4, 64))
            src = r.normal(size=(n, 3)).astype(np.float32)
            T = random_T(jax.random.PRNGKey(100 + seed))
            dst = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
            dst += r.normal(size=dst.shape).astype(np.float32) * 0.01
            w = r.uniform(0.1, 1.0, size=n).astype(np.float32)
            Rq, tq = reg.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), method="quest")
            Re, te = reg.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), method="eigh")
            ang = float(g3.angular_error(Rq, Re))
            assert ang < 0.06, f"seed {seed}: quest vs eigh {ang} deg"
            np.testing.assert_allclose(np.asarray(tq), np.asarray(te), atol=1e-3)


class TestRansacSampler:
    def test_selected_indices_always_valid(self):
        """Inverse-CDF triad sampling must never select an invalid match,
        for scattered, prefix-only, and single-valid masks."""
        from poseestimator_tpu.registration.ransac import sample_triads

        masks = [
            np.zeros(257, bool),
            np.zeros(64, bool),
            np.zeros(1024, bool),
        ]
        masks[0][::7] = True
        masks[1][:5] = True
        masks[2][-1] = True  # single valid entry at the end
        for i, m in enumerate(masks):
            sel = np.asarray(
                sample_triads(jax.random.PRNGKey(i), jnp.asarray(m), 512)
            )
            assert sel.shape == (512, 3)
            assert m[sel].all(), f"mask {i}: sampled invalid index"

    def test_uniform_over_valid(self):
        from poseestimator_tpu.registration.ransac import sample_triads

        m = np.zeros(100, bool)
        m[10:90] = True
        sel = np.asarray(
            sample_triads(jax.random.PRNGKey(7), jnp.asarray(m), 4096)
        ).ravel()
        counts = np.bincount(sel, minlength=100)
        assert counts[:10].sum() == 0 and counts[90:].sum() == 0
        # each valid index expected 4096*3/80 ~= 153.6 times; loose 3-sigma
        assert counts[10:90].min() > 80


class TestMatchFeatures:
    def test_identity_matching(self, rng):
        f = rng.normal(size=(30, 33)).astype(np.float32)
        valid = jnp.ones(30, bool)
        idx, ok = reg.match_features(jnp.asarray(f), valid, jnp.asarray(f), valid)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(30))
        assert bool(jnp.all(ok))

    def test_mutual_filter(self, rng):
        fa = rng.normal(size=(10, 4)).astype(np.float32)
        fb = np.concatenate([fa, fa + 0.01]).astype(np.float32)  # duplicates
        idx, ok = reg.match_features(
            jnp.asarray(fa), jnp.ones(10, bool), jnp.asarray(fb), jnp.ones(20, bool), mutual=True
        )
        assert bool(jnp.all(ok))  # each a matches its near-exact twin mutually


class TestRansac:
    def _make_problem(self, rng, n=60, outlier_frac=0.3, noise=0.0):
        src = rng.normal(size=(n, 3)).astype(np.float32)
        T = random_T(jax.random.PRNGKey(7))
        dst = src @ T[:3, :3].T + T[:3, 3]
        dst += rng.normal(size=dst.shape).astype(np.float32) * noise
        n_out = int(n * outlier_frac)
        dst[:n_out] = rng.normal(size=(n_out, 3)) * 2.0  # break matches
        match_idx = jnp.arange(n)
        return src, dst.astype(np.float32), T, match_idx

    def test_clean_recovery(self, rng):
        src, dst, T, midx = self._make_problem(rng, outlier_frac=0.0)
        r = reg.ransac_registration(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst), midx,
            jnp.ones(len(src), bool), 0.05, n_iters=512,
        )
        ang, trans = pose_errors(r.T, T)
        assert bool(r.found)
        assert ang < 1e-3 and trans < 1e-3
        assert int(r.n_inliers) == len(src)

    def test_outlier_robustness(self, rng):
        src, dst, T, midx = self._make_problem(rng, outlier_frac=0.4, noise=0.005)
        r = reg.ransac_registration(
            jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(dst), midx,
            jnp.ones(len(src), bool), 0.03, n_iters=2048,
        )
        ang, trans = pose_errors(r.T, T)
        assert ang < 0.05 and trans < 0.05
        # outlier rows excluded from the correspondence set
        assert not np.any(np.asarray(r.corr_mask)[: int(0.4 * len(src))])

    def test_retry_ladder(self, rng):
        src, dst, T, midx = self._make_problem(rng, outlier_frac=0.0, noise=0.02)
        # deliberately tiny threshold: first attempt fails, 2x retry succeeds
        r = reg.get_correspondences(
            jax.random.PRNGKey(2), jnp.asarray(src), jnp.asarray(dst), midx,
            jnp.ones(len(src), bool), 0.02, n_iters=512,
        )
        assert int(r.n_inliers) >= 3


class TestICP:
    def test_converges_from_small_offset(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        dst = g3.from_points(pts)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(g3.rot_z(0.1))
        T[:3, 3] = [0.05, -0.03, 0.02]
        src = g3.from_points(pts).transform(g3.inv_T(jnp.asarray(T)))
        res = reg.icp_point_to_point(src, dst, max_corr_dist=0.5, max_iterations=50)
        ang, trans = pose_errors(res.T, T)
        assert ang < 0.01 and trans < 0.01
        assert float(res.fitness) > 0.99

    def test_identity_on_aligned(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        c = g3.from_points(pts)
        res = reg.icp_point_to_point(c, c, max_corr_dist=0.1)
        np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=1e-4)
        assert float(res.inlier_rmse) < 1e-5

    def test_partial_overlap(self, rng):
        # src is a subset of dst, shifted slightly
        pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
        dst = g3.from_points(pts)
        sub = pts[:150] + np.array([0.02, 0, 0], np.float32)
        src = g3.from_points(sub, capacity=300)
        res = reg.icp_point_to_point(src, dst, max_corr_dist=0.3, max_iterations=50)
        assert float(res.fitness) > 0.9
        t = np.asarray(res.T)[:3, 3]
        assert abs(t[0] + 0.02) < 0.02

    def test_accel_matches_exact_on_clean_recovery(self, rng):
        """accel=True (Besl-McKay step extrapolation) must reach the same
        fixpoint as the exact iteration sequence on a well-posed problem."""
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        dst = g3.from_points(pts)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(g3.rot_z(0.1))
        T[:3, 3] = [0.05, -0.03, 0.02]
        src = g3.from_points(pts).transform(g3.inv_T(jnp.asarray(T)))
        res = reg.icp_point_to_point(src, dst, max_corr_dist=0.5,
                                     max_iterations=50, accel=True)
        ang, trans = pose_errors(res.T, T)
        assert ang < 0.01 and trans < 0.01
        assert float(res.fitness) > 0.99

    def test_accel_beats_exact_on_tangential_slide(self, rng):
        """The regime accel exists for: registering two INDEPENDENT samplings
        of the same plane-dominated surface (distinct sample sets slide
        tangentially — the linear-convergence crawl of p2p). Iteration-for-
        iteration, the extrapolated run must land a tighter pose."""
        def plate(r, n):
            p = r.uniform(-1, 1, size=(n, 3)).astype(np.float32)
            p[:, 2] = np.sign(p[:, 2]) * 0.05  # thin slab: two big flats
            return p

        dst = g3.from_points(plate(np.random.default_rng(1), 800))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(g3.rot_z(0.02))
        T[:3, 3] = [0.03, -0.02, 0.005]
        src = g3.from_points(plate(np.random.default_rng(2), 800)).transform(
            g3.inv_T(jnp.asarray(T)))
        kw = dict(max_corr_dist=0.2, max_iterations=12,
                  relative_fitness=1e-6, relative_rmse=1e-6)
        res_exact = reg.icp_point_to_point(src, dst, **kw)
        res_accel = reg.icp_point_to_point(src, dst, accel=True,
                                           accel_pose_tol=5e-5, **kw)
        ang_e, tr_e = pose_errors(res_exact.T, T)
        ang_a, tr_a = pose_errors(res_accel.T, T)
        # within the same iteration budget the accelerated run must close
        # at least as much of the in-plane error (the independent samplings
        # put a noise floor under both, so the margin here is small; the
        # decisive measurement is the on-chip bench-scene sweep in
        # docs/PERFORMANCE.md: 0.72 mm @ 15 it accel vs 0.94 mm @ 23 it
        # exact)
        err_e = tr_e + ang_e
        err_a = tr_a + ang_a
        assert err_a <= err_e, (err_a, err_e, int(res_accel.n_iters),
                                int(res_exact.n_iters))


class TestICPPointToPlane:
    def test_converges_on_plane_heavy_surface(self, rng):
        # box surface: point-to-plane should converge from a coarse offset
        faces = []
        for ax in range(3):
            for sgn in (-1.0, 1.0):
                f = rng.uniform(-0.1, 0.1, size=(80, 3)).astype(np.float32)
                f[:, ax] = sgn * 0.1
                faces.append(f)
        pts = np.concatenate(faces)
        dst = g3.from_points(pts)
        dst = g3.estimate_normals(dst, radius=0.06, max_nn=20, orient_towards=None)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(g3.rot_y(0.08))
        T[:3, 3] = [0.01, -0.015, 0.02]
        src = g3.from_points(pts).transform(g3.inv_T(jnp.asarray(T)))
        res = reg.icp_point_to_plane(src, dst, max_corr_dist=0.1, max_iterations=30)
        ang, trans = pose_errors(res.T, T)
        assert ang < 0.01 and trans < 0.005, (ang, trans)

    def test_fewer_iterations_than_point_to_point(self, rng):
        pts = rng.uniform(-0.2, 0.2, size=(400, 3)).astype(np.float32)
        pts[:, 2] = 0.02 * np.sin(pts[:, 0] * 20)  # smooth wavy sheet
        dst = g3.from_points(pts)
        dst = g3.estimate_normals(dst, radius=0.08, max_nn=20, orient_towards=None)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.01, 0.01, 0.01]
        src = g3.from_points(pts).transform(g3.inv_T(jnp.asarray(T)))
        r_plane = reg.icp_point_to_plane(src, dst, 0.1, max_iterations=50)
        r_point = reg.icp_point_to_point(src, dst, 0.1, max_iterations=50)
        assert int(r_plane.n_iters) <= int(r_point.n_iters)

    def test_requires_normals(self, rng):
        c = g3.from_points(rng.normal(size=(10, 3)).astype(np.float32))
        with pytest.raises(ValueError):
            reg.icp_point_to_plane(c, c, 0.1)


class TestMaxClique:
    def test_planted_clique(self, rng):
        K = 60
        clique_size = 20
        A = rng.random((K, K)) < 0.08
        A = np.triu(A, 1)
        A = A | A.T
        members = rng.choice(K, clique_size, replace=False)
        for i in members:
            for j in members:
                if i != j:
                    A[i, j] = True
        mask, size = reg.max_clique_greedy(jnp.asarray(A), jnp.ones(K, bool))
        assert int(size) >= clique_size  # finds the planted clique
        found = np.where(np.asarray(mask))[0]
        # verify it IS a clique
        for i in found:
            for j in found:
                if i != j:
                    assert A[i, j]

    def test_invalid_vertices_excluded(self, rng):
        A = np.ones((10, 10), bool)
        valid = np.ones(10, bool)
        valid[7:] = False
        mask, size = reg.max_clique_greedy(jnp.asarray(A), jnp.asarray(valid))
        assert int(size) == 7
        assert not np.any(np.asarray(mask)[7:])

    def test_max_kcore_planted_clique(self, rng):
        # a clique of size c is a (c-1)-core; with only sparse random edges
        # elsewhere, the max k-core IS the planted clique
        K, c = 60, 12
        A = rng.random((K, K)) < 0.05
        A = A | A.T
        np.fill_diagonal(A, False)
        members = rng.choice(K, c, replace=False)
        for i in members:
            for j in members:
                if i != j:
                    A[i, j] = True
        core, k = reg.max_kcore(jnp.asarray(A), jnp.ones(K, bool))
        assert int(k) >= c - 1
        assert np.all(np.asarray(core)[members])  # clique inside the core
        # every core vertex has >= k neighbors inside the core
        core_np = np.asarray(core)
        deg = (A & core_np[None, :])[core_np].sum(axis=1)
        assert np.all(deg >= int(k))

    def test_max_kcore_invalid_excluded(self):
        A = np.ones((8, 8), bool)
        np.fill_diagonal(A, False)
        valid = np.ones(8, bool)
        valid[5:] = False
        core, k = reg.max_kcore(jnp.asarray(A), jnp.asarray(valid))
        assert int(k) == 4  # 5-clique on the valid vertices
        assert not np.any(np.asarray(core)[5:])
        assert int(np.asarray(core).sum()) == 5


class TestTeaser:
    def _problem(self, rng, n=80, outlier_frac=0.5, noise=0.005, key=11):
        src = rng.normal(size=(n, 3)).astype(np.float32)
        T = random_T(jax.random.PRNGKey(key))
        dst = src @ T[:3, :3].T + T[:3, 3]
        dst += rng.normal(size=dst.shape).astype(np.float32) * noise
        n_out = int(n * outlier_frac)
        out_idx = rng.choice(n, n_out, replace=False)
        dst[out_idx] = rng.uniform(-2, 2, size=(n_out, 3))
        return src, dst.astype(np.float32), T, out_idx

    def test_clean(self, rng):
        src, dst, T, _ = self._problem(rng, outlier_frac=0.0, noise=0.0)
        sol = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src), bool),
            reg.TeaserParams(noise_bound=0.01),
        )
        ang, trans = pose_errors(np.asarray(sol.T), T)
        assert ang < 1e-3 and trans < 1e-3

    @pytest.mark.parametrize("outlier_frac", [0.3, 0.5, 0.7])
    def test_outlier_robustness(self, rng, outlier_frac):
        src, dst, T, out_idx = self._problem(rng, outlier_frac=outlier_frac)
        sol = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src), bool),
            reg.TeaserParams(noise_bound=0.02),
        )
        ang, trans = pose_errors(np.asarray(sol.T), T)
        assert ang < 0.05, f"angular error {ang} at {outlier_frac} outliers"
        assert trans < 0.05
        # outliers must not be in the clique
        assert not np.any(np.asarray(sol.clique_mask)[out_idx])

    def test_gnc_tls_flavor(self, rng):
        # registration_utils.py:251-258 parameterization
        src, dst, T, _ = self._problem(rng, outlier_frac=0.4, key=13)
        params = reg.TeaserParams(
            noise_bound=0.02, cbar2=1.0,
            rotation_estimation_algorithm=int(reg.RotationEstimationAlgorithm.GNC_TLS),
            rotation_gnc_factor=1.4, rotation_max_iterations=100,
            rotation_cost_threshold=1e-12,
        )
        sol = reg.teaser_solve(jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src), bool), params)
        ang, trans = pose_errors(np.asarray(sol.T), T)
        assert ang < 0.05 and trans < 0.05
        assert int(jnp.sum(sol.rotation_inliers)) > 0

    def test_too_few_correspondences(self):
        src = jnp.zeros((10, 3))
        dst = jnp.ones((10, 3))
        valid = jnp.zeros(10, bool).at[0].set(True).at[1].set(True)
        sol = reg.teaser_solve(src, dst, valid)
        assert not bool(sol.valid)
        np.testing.assert_allclose(np.asarray(sol.rotation), np.eye(3), atol=1e-6)

    def test_padded_equals_dense(self, rng):
        src, dst, T, _ = self._problem(rng, n=40, outlier_frac=0.3, key=17)
        sol_a = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(40, bool),
            reg.TeaserParams(noise_bound=0.02),
        )
        pad_src = np.concatenate([src, rng.normal(size=(24, 3)).astype(np.float32)])
        pad_dst = np.concatenate([dst, rng.normal(size=(24, 3)).astype(np.float32)])
        valid = np.concatenate([np.ones(40, bool), np.zeros(24, bool)])
        sol_b = reg.teaser_solve(
            jnp.asarray(pad_src), jnp.asarray(pad_dst), jnp.asarray(valid),
            reg.TeaserParams(noise_bound=0.02),
        )
        np.testing.assert_allclose(
            np.asarray(sol_a.rotation), np.asarray(sol_b.rotation), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(sol_a.translation), np.asarray(sol_b.translation), atol=1e-4
        )

    def test_refit_flag_isolates_deviation(self, rng):
        # teaser.py refit is a documented beyond-reference deviation; with
        # refit=False the solve must return the raw decoupled estimate
        # (rotation from GNC-TLS alone, translation from component TLS).
        src, dst, T, _ = self._problem(rng, outlier_frac=0.0, noise=0.0, key=23)
        valid = jnp.ones(len(src), bool)
        p_raw = reg.TeaserParams(noise_bound=0.01, refit=False)
        sol_raw = reg.teaser_solve(jnp.asarray(src), jnp.asarray(dst), valid, p_raw)
        sol_fit = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst), valid,
            reg.TeaserParams(noise_bound=0.01),
        )
        # on a clean problem both recover the truth...
        for sol in (sol_raw, sol_fit):
            ang, trans = pose_errors(np.asarray(sol.T), T)
            assert ang < 1e-3 and trans < 1e-3
        # ...and the no-refit result equals the decoupled expectation:
        # translation = component-wise TLS of dst - R @ src on the inliers
        R = np.asarray(sol_raw.rotation)
        diffs = dst - src @ R.T
        sel = np.asarray(sol_raw.translation_inliers)
        expected_t = diffs[sel].mean(axis=0)
        np.testing.assert_allclose(
            np.asarray(sol_raw.translation), expected_t, atol=1e-5
        )

    @pytest.mark.parametrize("outlier_frac", [0.0, 0.4])
    def test_fgr_rotation_backend(self, rng, outlier_frac):
        # Geman-McClure GNC (TEASER++'s FGR back-end): same recovery
        # guarantees as GNC_TLS on clean and corrupted problems
        src, dst, T, out_idx = self._problem(
            rng, outlier_frac=outlier_frac, noise=0.003, key=29
        )
        params = reg.TeaserParams(
            noise_bound=0.02,
            rotation_estimation_algorithm=int(reg.RotationEstimationAlgorithm.FGR),
        )
        sol = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src), bool), params
        )
        ang, trans = pose_errors(np.asarray(sol.T), T)
        assert ang < 0.05 and trans < 0.05
        assert int(jnp.sum(sol.rotation_inliers)) > 0

    def test_kcore_inlier_selection(self, rng):
        # KCORE_HEU mode: pose recovery without the clique search
        src, dst, T, out_idx = self._problem(rng, outlier_frac=0.4, key=31)
        params = reg.TeaserParams(
            noise_bound=0.02,
            inlier_selection_mode=int(reg.InlierSelectionMode.KCORE_HEU),
        )
        sol = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src), bool), params
        )
        ang, trans = pose_errors(np.asarray(sol.T), T)
        assert ang < 0.05 and trans < 0.05

    def test_quatro_rotation_backend(self, rng):
        # QUATRO estimates quasi-SO(3): a yaw-only ground truth must be
        # recovered, and the returned rotation must itself be yaw-only
        n = 80
        src = rng.normal(size=(n, 3)).astype(np.float32)
        th = 1.1
        Rz = np.array(
            [
                [np.cos(th), -np.sin(th), 0.0],
                [np.sin(th), np.cos(th), 0.0],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        t_gt = np.array([0.3, -0.2, 0.5], np.float32)
        dst = src @ Rz.T + t_gt
        dst += rng.normal(size=dst.shape).astype(np.float32) * 0.003
        out_idx = rng.choice(n, n // 3, replace=False)
        dst[out_idx] = rng.uniform(-2, 2, size=(len(out_idx), 3)).astype(np.float32)
        params = reg.TeaserParams(
            noise_bound=0.02,
            rotation_estimation_algorithm=int(reg.RotationEstimationAlgorithm.QUATRO),
        )
        sol = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst.astype(np.float32)),
            jnp.ones(n, bool), params,
        )
        R = np.asarray(sol.rotation)
        # structurally yaw-only (refit included)
        np.testing.assert_allclose(R[2, 2], 1.0, atol=1e-6)
        np.testing.assert_allclose(R[2, :2], 0.0, atol=1e-6)
        np.testing.assert_allclose(R[:2, 2], 0.0, atol=1e-6)
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3] = Rz
        T_gt[:3, 3] = t_gt
        ang, trans = pose_errors(np.asarray(sol.T), T_gt)
        assert ang < 0.05 and trans < 0.05

    def test_scale_estimation(self, rng):
        src = rng.normal(size=(50, 3)).astype(np.float32)
        T = random_T(jax.random.PRNGKey(19))
        s_true = 1.7
        dst = (src * s_true) @ T[:3, :3].T + T[:3, 3]
        sol = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst.astype(np.float32)), jnp.ones(50, bool),
            reg.TeaserParams(noise_bound=0.01, estimate_scaling=True),
        )
        assert abs(float(sol.scale) - s_true) < 0.02


class TestEndToEndRegistration:
    """FPFH -> matches -> RANSAC corr -> TEASER -> ICP on synthetic clouds:
    the full stage-2 milestone of SURVEY.md section 7."""

    def test_register_transformed_cloud(self, rng):
        # structured cloud (box surface) so FPFH has signal
        n_side = 120
        faces = []
        for ax in range(3):
            for sgn in [-1.0, 1.0]:
                f = rng.uniform(-0.1, 0.1, size=(n_side, 3)).astype(np.float32)
                f[:, ax] = sgn * 0.1
                faces.append(f)
        pts = np.concatenate(faces)  # 720 points on a box
        T_gt = random_T(jax.random.PRNGKey(23))

        dst_np = (pts @ T_gt[:3, :3].T + T_gt[:3, 3]).astype(np.float32)
        dst_np += rng.normal(size=dst_np.shape).astype(np.float32) * 0.001

        key = jax.random.PRNGKey(0)
        src = g3.farthest_point_sampling(key, g3.from_points(pts), 256)
        dst = g3.farthest_point_sampling(jax.random.fold_in(key, 1), g3.from_points(dst_np), 256)

        src = g3.estimate_normals(src, radius=0.06, max_nn=30, orient_towards=src.centroid())
        dst = g3.estimate_normals(dst, radius=0.06, max_nn=30, orient_towards=dst.centroid())
        f_src, _ = g3.compute_fpfh(src, radius=0.125, max_nn=100)
        f_dst, _ = g3.compute_fpfh(dst, radius=0.125, max_nn=100)

        midx, mok = reg.match_features(f_src, src.valid, f_dst, dst.valid)
        r = reg.ransac_registration(
            jax.random.PRNGKey(5), src.points, dst.points, midx, mok, 0.02, n_iters=4096
        )
        assert int(r.n_inliers) >= 20

        sol = reg.teaser_solve(
            src.points, dst.points[midx],
            r.corr_mask, reg.TeaserParams(noise_bound=0.01),
        )
        icp = reg.icp_point_to_point(
            src, dst, max_corr_dist=0.02, init_T=sol.T, max_iterations=50
        )
        ang, trans = pose_errors(np.asarray(icp.T), T_gt)
        assert ang < 0.05, f"angular {ang}"
        assert trans < 0.02, f"translation {trans}"


class TestRobustICP:
    def test_huber_resists_contamination(self, rng):
        """Contaminated correspondences inside the gate: robust kernels keep
        the estimate close, plain least squares gets dragged."""
        pts = rng.uniform(-0.5, 0.5, size=(300, 3)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.01, -0.01, 0.008]
        dst_pts = pts @ T[:3, :3].T + T[:3, 3]
        # 25% contamination: shifted by just under the gate so it passes
        n_bad = 75
        dst_pts[:n_bad] += np.array([0.08, 0.08, 0.0], np.float32)
        dst = g3.from_points(dst_pts)
        src = g3.from_points(pts)

        errs = {}
        for kernel in ("none", "huber", "tukey"):
            res = reg.icp_point_to_point(
                src, dst, max_corr_dist=0.2, max_iterations=50, robust=kernel
            )
            ang, trans = pose_errors(res.T, T)
            errs[kernel] = trans
        assert errs["huber"] < errs["none"], errs
        assert errs["tukey"] < errs["none"], errs
        assert errs["tukey"] < 0.01, errs

    def test_robust_matches_plain_on_clean_data(self, rng):
        pts = rng.normal(size=(150, 3)).astype(np.float32)
        c = g3.from_points(pts)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.02, 0.01, -0.015]
        src = g3.from_points(pts).transform(g3.inv_T(jnp.asarray(T)))
        r_plain = reg.icp_point_to_point(src, c, 0.2, max_iterations=50)
        r_rob = reg.icp_point_to_point(src, c, 0.2, max_iterations=50, robust="huber")
        a1, t1 = pose_errors(r_plain.T, T)
        a2, t2 = pose_errors(r_rob.T, T)
        assert t1 < 1e-3 and t2 < 1e-3


class TestICPCovariance:
    """Gauss-Newton pose covariance (ICPResult.cov, with_cov=True)."""

    def test_default_path_has_no_cov(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        c = g3.from_points(pts)
        assert reg.icp_point_to_point(c, c, 0.1).cov is None

    def test_plane_observability_structure(self, rng):
        # points on z=0 with small normal noise: point-to-plane information
        # constrains ONLY t_z and the in-plane rotations (w_x, w_y); the
        # unobservable directions (t_x, t_y slides, w_z spin) must come out
        # with variances orders of magnitude larger
        pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
        pts[:, 2] = 0.0
        noisy = pts.copy()
        noisy[:, 2] = rng.normal(scale=1e-3, size=300)  # residuals != 0
        dst = g3.from_points(noisy)
        nrm = np.zeros((300, 3), np.float32)
        nrm[:, 2] = 1.0
        dst = dst.replace(normals=jnp.asarray(nrm))
        src = g3.from_points(pts)
        res = reg.icp_point_to_plane(
            src, dst, 0.1, max_iterations=5, with_cov=True
        )
        cov = np.asarray(res.cov)
        assert cov.shape == (6, 6) and np.all(np.isfinite(cov))
        v = np.diag(cov)
        # observable: w_x (0), w_y (1), t_z (5); unobservable: w_z (2),
        # t_x (3), t_y (4)
        for good in (0, 1, 5):
            for bad in (2, 3, 4):
                assert v[bad] > 1e4 * v[good], (good, bad, v)

    def test_statistical_calibration_p2p(self, rng):
        # dst = T*src + iid Gaussian noise, noise << NN spacing so the data
        # association is correct: the empirical covariance of the estimated
        # twist over repeated noise draws must match the predicted
        # Gauss-Newton covariance to a small factor
        pts = rng.uniform(-0.5, 0.5, size=(400, 3)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(g3.rot_z(0.05))
        T[:3, 3] = [0.02, -0.01, 0.015]
        src = g3.from_points(pts)
        sigma = 0.002
        errs, preds = [], []
        for k in range(25):
            noise = rng.normal(scale=sigma, size=(400, 3)).astype(np.float32)
            dst = g3.from_points(pts @ T[:3, :3].T + T[:3, 3] + noise)
            res = reg.icp_point_to_point(
                src, dst, max_corr_dist=0.05, init_T=jnp.asarray(T),
                max_iterations=10, with_cov=True,
            )
            E = np.asarray(res.T) @ np.linalg.inv(T)
            dw = 0.5 * np.array(
                [E[2, 1] - E[1, 2], E[0, 2] - E[2, 0], E[1, 0] - E[0, 1]]
            )
            errs.append(np.concatenate([dw, E[:3, 3]]))
            preds.append(np.asarray(res.cov))
        emp = np.cov(np.stack(errs).T)
        pred = np.mean(np.stack(preds), axis=0)
        ratio = np.trace(emp) / np.trace(pred)
        assert 0.3 < ratio < 3.0, ratio
        # per-block sanity: rotation and translation scales both agree
        r_rot = np.trace(emp[:3, :3]) / max(np.trace(pred[:3, :3]), 1e-18)
        r_t = np.trace(emp[3:, 3:]) / max(np.trace(pred[3:, 3:]), 1e-18)
        assert 0.2 < r_rot < 5.0, r_rot
        assert 0.2 < r_t < 5.0, r_t

    def test_noisier_data_larger_cov(self, rng):
        pts = rng.uniform(-0.5, 0.5, size=(300, 3)).astype(np.float32)
        src = g3.from_points(pts)
        tr = []
        for sigma in (0.001, 0.004):
            dst = g3.from_points(
                pts + rng.normal(scale=sigma, size=(300, 3)).astype(np.float32)
            )
            res = reg.icp_point_to_point(
                src, dst, 0.05, max_iterations=8, with_cov=True
            )
            tr.append(float(np.trace(np.asarray(res.cov))))
        assert tr[1] > 4.0 * tr[0], tr  # variance scales ~ sigma^2 (16x)
