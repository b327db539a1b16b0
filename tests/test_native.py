"""Native exact max-clique: correctness (brute force), and agreement of the
TPU greedy kernel with the exact solver on registration-style consistency
graphs (the PMC_EXACT verification loop promised in maxclique.py)."""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu.registration.maxclique import max_clique_greedy
from poseestimator_tpu.registration.native import available, max_clique_exact

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


def brute_force_clique(A):
    n = len(A)
    for r in range(n, 0, -1):
        for comb in itertools.combinations(range(n), r):
            if all(A[a][b] for a, b in itertools.combinations(comb, 2)):
                return r
    return 0


class TestExact:
    def test_matches_brute_force(self, rng):
        for density in (0.2, 0.5, 0.8):
            for _ in range(3):
                n = 13
                A = rng.random((n, n)) < density
                A = np.triu(A, 1)
                A = A | A.T
                _, size = max_clique_exact(A)
                assert size == brute_force_clique(A)

    def test_clique_is_valid(self, rng):
        n = 60
        A = rng.random((n, n)) < 0.3
        A = np.triu(A, 1)
        A = A | A.T
        mask, size = max_clique_exact(A)
        found = np.where(mask)[0]
        assert len(found) == size
        for i in found:
            for j in found:
                if i != j:
                    assert A[i, j]

    def test_valid_mask(self, rng):
        A = np.ones((10, 10), bool)
        valid = np.ones(10, bool)
        valid[6:] = False
        mask, size = max_clique_exact(A, valid)
        assert size == 6
        assert not mask[6:].any()


class TestGreedyVsExact:
    def _consistency_graph(self, rng, n=60, inlier_frac=0.5, noise=0.01):
        """The graph family the solver actually sees: pairwise-distance
        consistency of correspondences with a planted inlier set."""
        src = rng.normal(size=(n, 3)).astype(np.float32)
        dst = src + rng.normal(size=(n, 3)).astype(np.float32) * noise
        n_out = int(n * (1 - inlier_frac))
        out_idx = rng.choice(n, n_out, replace=False)
        dst[out_idx] = rng.uniform(-2, 2, (n_out, 3))
        ds = np.linalg.norm(src[:, None] - src[None, :], axis=-1)
        dd = np.linalg.norm(dst[:, None] - dst[None, :], axis=-1)
        return np.abs(dd - ds) <= 0.05

    @pytest.mark.parametrize("inlier_frac", [0.3, 0.5, 0.8])
    def test_greedy_matches_exact_on_registration_graphs(self, rng, inlier_frac):
        A = self._consistency_graph(rng, inlier_frac=inlier_frac)
        _, exact_size = max_clique_exact(A)
        _, greedy_size = max_clique_greedy(jnp.asarray(A), jnp.ones(len(A), bool))
        assert int(greedy_size) == exact_size

    def test_greedy_near_exact_on_random_graphs(self, rng):
        # adversarial-ish: uniform random graphs; greedy must stay close
        for density in (0.3, 0.6):
            A = rng.random((50, 50)) < density
            A = np.triu(A, 1)
            A = A | A.T
            _, exact_size = max_clique_exact(A)
            _, greedy_size = max_clique_greedy(jnp.asarray(A), jnp.ones(50, bool))
            assert int(greedy_size) >= exact_size - 1
