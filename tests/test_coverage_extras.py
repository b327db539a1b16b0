"""Coverage for less-traveled paths: COMPLETE TIM graph, TLS scale with
outliers, the chunked nearest-neighbor path, NONE inlier selection, and the
correspondence overlay."""
import jax
import jax.numpy as jnp
import numpy as np

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu import registration as reg


def make_pair(rng, n=50, key=31):
    src = rng.normal(size=(n, 3)).astype(np.float32)
    R = np.asarray(g3.random_rotation(jax.random.PRNGKey(key)))
    t = np.array([0.2, -0.1, 0.3], np.float32)
    dst = (src @ R.T + t).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return src, dst, T


class TestTeaserVariants:
    def test_complete_tim_graph(self, rng):
        src, dst, T = make_pair(rng, n=40)
        params = reg.TeaserParams(
            noise_bound=0.01,
            rotation_tim_graph=int(reg.InlierGraphFormulation.COMPLETE),
        )
        sol = reg.teaser_solve(jnp.asarray(src), jnp.asarray(dst), jnp.ones(40, bool), params)
        ang = float(g3.angular_error(jnp.asarray(T[:3, :3]), sol.rotation))
        assert ang < 0.01
        np.testing.assert_allclose(np.asarray(sol.translation), T[:3, 3], atol=0.01)

    def test_inlier_selection_none(self, rng):
        src, dst, T = make_pair(rng, n=40, key=33)
        params = reg.TeaserParams(
            noise_bound=0.01,
            inlier_selection_mode=int(reg.InlierSelectionMode.NONE),
        )
        sol = reg.teaser_solve(jnp.asarray(src), jnp.asarray(dst), jnp.ones(40, bool), params)
        ang = float(g3.angular_error(jnp.asarray(T[:3, :3]), sol.rotation))
        assert ang < 0.01

    def test_scale_estimation_with_outliers(self, rng):
        src, _, _ = make_pair(rng, n=60, key=35)
        R = np.asarray(g3.random_rotation(jax.random.PRNGKey(36)))
        s_true = 0.6
        dst = (src * s_true) @ R.T + np.array([0.1, 0.2, -0.1], np.float32)
        out = rng.choice(60, 15, replace=False)
        dst[out] = rng.uniform(-2, 2, (15, 3)).astype(np.float32)
        sol = reg.teaser_solve(
            jnp.asarray(src), jnp.asarray(dst.astype(np.float32)), jnp.ones(60, bool),
            reg.TeaserParams(noise_bound=0.02, estimate_scaling=True),
        )
        assert abs(float(sol.scale) - s_true) < 0.05


class TestChunkedNN:
    def test_chunked_matches_block(self, rng, monkeypatch):
        import importlib

        # note: ``from poseestimator_tpu.geom3d import knn`` resolves to the
        # FUNCTION re-exported by __init__, not the submodule
        knn_mod = importlib.import_module("poseestimator_tpu.geom3d.knn")

        q = rng.normal(size=(533, 3)).astype(np.float32)
        d = rng.normal(size=(411, 3)).astype(np.float32)
        qv = np.ones(533, bool)
        qv[500:] = False
        dv = np.ones(411, bool)
        ref = knn_mod._nn_block(jnp.asarray(q), jnp.asarray(qv), jnp.asarray(d), jnp.asarray(dv))
        monkeypatch.setattr(knn_mod, "_NN_CHUNK_BUDGET", 10_000)  # force chunking
        out = knn_mod.nearest_neighbor(
            jnp.asarray(q), jnp.asarray(qv), jnp.asarray(d), jnp.asarray(dv)
        )
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(out[2]))


class TestCorrespondenceOverlay:
    def test_draws_lines(self, rng):
        from poseestimator_tpu.utils.overlay import draw_correspondences

        img = np.zeros((100, 100, 3), np.uint8)
        src = rng.uniform(-0.1, 0.1, (20, 3)).astype(np.float32)
        src[:, 2] = 0.0
        dst = src + np.array([0.05, 0.0, 0.0], np.float32)
        K = np.array([[200.0, 0, 50], [0, 200, 50], [0, 0, 1]])
        T_src = np.eye(4, dtype=np.float32)
        T_src[2, 3] = 1.0
        # dst drawn at identity: push dst points to z=1 as well
        dst[:, 2] = 1.0
        out = draw_correspondences(
            img, src, dst, np.ones(20, bool), K, T_src=T_src
        )
        assert (out[..., 1] > 0).any()  # green correspondence lines drawn
