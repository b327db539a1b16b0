"""Pallas fused NN kernel: interpreter-mode correctness vs the XLA reference
(SURVEY.md section 5: Pallas kernels get interpret=True runs in CI)."""
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu.geom3d.knn import _nn_block
from poseestimator_tpu.geom3d.pallas_nn import nn_pallas


class TestPallasNN:
    @pytest.mark.parametrize("n,m", [(100, 300), (256, 512), (300, 700)])
    def test_matches_reference(self, rng, n, m):
        q = rng.normal(size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(m, 3)).astype(np.float32)
        qv = jnp.ones(n, bool)
        dv = jnp.ones(m, bool)
        rd, ri, rf = _nn_block(jnp.asarray(q), qv, jnp.asarray(d), dv)
        pd, pi, pf = nn_pallas(jnp.asarray(q), qv, jnp.asarray(d), dv, interpret=True)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(pi))
        np.testing.assert_allclose(np.asarray(rd), np.asarray(pd), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(rf), np.asarray(pf))

    def test_invalid_data_excluded(self, rng):
        q = rng.normal(size=(50, 3)).astype(np.float32)
        d = rng.normal(size=(128, 3)).astype(np.float32)
        d[0] = q[0]  # exact match, but invalidated
        dv = np.ones(128, bool)
        dv[0] = False
        pd, pi, pf = nn_pallas(
            jnp.asarray(q), jnp.ones(50, bool), jnp.asarray(d), jnp.asarray(dv),
            interpret=True,
        )
        assert int(pi[0]) != 0

    def test_invalid_query_not_found(self, rng):
        q = rng.normal(size=(10, 3)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        qv = np.ones(10, bool)
        qv[3] = False
        pd, pi, pf = nn_pallas(
            jnp.asarray(q), jnp.asarray(qv), jnp.asarray(d), jnp.ones(64, bool),
            interpret=True,
        )
        assert not bool(pf[3])
        assert float(pd[3]) == 0.0

    def test_all_data_invalid(self, rng):
        q = rng.normal(size=(10, 3)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        pd, pi, pf = nn_pallas(
            jnp.asarray(q), jnp.ones(10, bool), jnp.asarray(d), jnp.zeros(64, bool),
            interpret=True,
        )
        assert not np.asarray(pf).any()
