"""Sharded execution tests on the 8-device virtual mesh: template-axis
registration scoring, sharded Chamfer, mesh helpers."""
import jax
import jax.numpy as jnp
import numpy as np

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.parallel import (
    make_mesh,
    replicate,
    shard_along,
    sharded_chamfer,
    sharded_template_scores,
)


class TestMesh:
    def test_make_and_place(self):
        mesh = make_mesh("dp")
        assert mesh.devices.size == 8
        x = jnp.zeros((16, 4))
        xs = shard_along(mesh, x)
        assert xs.sharding.spec == jax.sharding.PartitionSpec("dp")
        xr = replicate(mesh, x)
        assert xr.sharding.spec == jax.sharding.PartitionSpec()


class TestShardedChamfer:
    def test_matches_single_device(self, rng):
        mesh = make_mesh("dp")
        a = rng.normal(size=(256, 3)).astype(np.float32)
        b = (a + rng.normal(size=(256, 3)).astype(np.float32) * 0.01)
        ca, cb = g3.from_points(a), g3.from_points(b)
        ref = float(g3.chamfer_distance(ca, cb))
        sh = float(
            sharded_chamfer(mesh, ca.points, ca.valid, cb.points, cb.valid)
        )
        assert abs(ref - sh) < 1e-5

    def test_masked(self, rng):
        mesh = make_mesh("dp")
        a = rng.normal(size=(128, 3)).astype(np.float32)
        av = np.ones(128, bool)
        av[64:] = False
        b = a.copy()
        ca = g3.from_points(a).mask_where(jnp.asarray(av))
        cb = g3.from_points(b)
        ref = float(g3.chamfer_distance(ca, cb))
        sh = float(sharded_chamfer(mesh, ca.points, ca.valid, cb.points, cb.valid))
        assert abs(ref - sh) < 1e-5


class TestShardedTemplateScores:
    def test_identity_template_wins(self, rng):
        mesh = make_mesh("tp")
        C, T = 128, 8
        base = rng.normal(size=(C, 3)).astype(np.float32) * 0.3
        tpls = []
        for t in range(T):
            if t == 3:
                tpls.append(base + rng.normal(size=(C, 3)).astype(np.float32) * 0.001)
            else:
                tpls.append(rng.normal(size=(C, 3)).astype(np.float32) * 0.3 + 1.0)
        Ts, scores = sharded_template_scores(
            mesh, jnp.asarray(base), jnp.ones(C, bool),
            jnp.asarray(np.stack(tpls)), jnp.ones((T, C), bool),
            jnp.tile(jnp.eye(4)[None], (T, 1, 1)), voxel=0.05,
        )
        scores = np.asarray(scores)
        assert scores.shape == (T,)
        assert int(np.argmin(scores)) == 3
