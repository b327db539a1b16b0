"""Shared realistic benchmark scene: a box CAD observed one camera-period
motion delta from the tracked pose.

The framework's per-frame programs are fixed-shape but content-DEPENDENT —
the ICP stages are ``lax.while_loop``s with early exit, so only the product
operating point times truthfully (random clouds either never converge and
pin the iteration caps, or find zero inliers and exit degenerately).
``bench.py`` and ``tools/profile_search.py --realistic`` both build this
scene so their numbers are comparable.
"""
from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

import numpy as np

BOX_HALF = (0.06, 0.04, 0.025)  # ~8 cm diagonal box CAD


@dataclass
class BenchScene:
    cad_pts: object  # (40k, 3) surface samples of the box, jnp
    cad_valid: object
    mesh_v: object  # raster assets of the box CAD (vertices (8,3), padded faces)
    mesh_f: object
    T0: object  # tracked pose (z = 0.5 m)
    T_obs: object  # T0 + one motion delta (0.01 rad + 2 mm)
    depth: object  # rendered observation at T_obs, (H, W)
    obj_sil: object  # depth > 0
    estimator: object  # product PoseEstimator with the rendered template DB
    dst_cloud: object  # 4096-pt sampled observation cloud
    cad_ply: str


def box_surface(rng: np.random.Generator, n: int, half=BOX_HALF) -> np.ndarray:
    """Uniform samples on the box shell (the bench CAD)."""
    half = np.asarray(half, np.float32)
    face = rng.integers(0, 6, size=n)
    pts = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32) * half[None, :]
    ax = face // 2
    pts[np.arange(n), ax] = (
        np.where(face % 2 == 0, 1.0, -1.0).astype(np.float32) * half[ax]
    )
    return pts


def box_mesh_arrays(half=BOX_HALF):
    """(vertices (8, 3), faces (12, 3)) of the bench box CAD."""
    bx, by, bz = (float(v) for v in half)
    verts = np.array(
        [[sx * bx, sy * by, sz * bz] for sx in (-1, 1) for sy in (-1, 1)
         for sz in (-1, 1)], np.float32)
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32)
    return verts, faces


def make_light_scene(intr, rng: np.random.Generator | None = None):
    """The scene WITHOUT the template-DB estimator (track-step profiling):
    returns (cad_pts, cad_valid, mesh_v, mesh_f, T0, T_obs, depth, obj_sil).
    The observation depth comes from the exact triangle raster (the
    independent camera instrument); ``mesh_v/mesh_f`` are the raster assets
    the tracker's predicted views consume."""
    import jax.numpy as jnp

    from poseestimator_tpu.render.mesh import pad_faces
    from poseestimator_tpu.render.raster import render_depth_mesh

    rng = rng or np.random.default_rng(0)
    cad_pts = jnp.asarray(box_surface(rng, 40_000))
    cad_valid = jnp.ones(40_000, bool)
    verts, faces = box_mesh_arrays()
    mesh_v = jnp.asarray(verts)
    mesh_f = jnp.asarray(pad_faces(faces, 256))
    T0 = jnp.eye(4).at[2, 3].set(0.5)
    c, s = np.cos(0.01), np.sin(0.01)
    delta = np.eye(4, dtype=np.float32)
    delta[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    delta[:3, 3] = [0.002, 0.0, 0.001]
    T_obs = jnp.asarray(delta) @ T0
    depth = render_depth_mesh(mesh_v, mesh_f, T_obs, intr, near=0.01, far=5.0)
    return cad_pts, cad_valid, mesh_v, mesh_f, T0, T_obs, depth, depth > 0


def make_scene(intr, rng: np.random.Generator | None = None) -> BenchScene:
    """Build the full realistic scene (renders the template DB on device —
    first call compiles; PoseEstimator's disk cache keeps re-runs cheap
    within the temp dir's lifetime)."""
    import jax

    from poseestimator_tpu import geom3d as g3
    from poseestimator_tpu.pipeline.pose_estimator import PoseEstimator
    from poseestimator_tpu.utils.plyio import write_ply

    rng = rng or np.random.default_rng(0)
    (cad_pts, cad_valid, mesh_v, mesh_f, T0, T_obs, depth,
     _sil) = make_light_scene(intr, rng)

    tmp_scene = tempfile.mkdtemp(prefix="bench_scene_")
    verts, faces = box_mesh_arrays()
    cad_ply = os.path.join(tmp_scene, "box.ply")
    write_ply(cad_ply, verts, faces=faces)
    estimator = PoseEstimator(cad_ply, os.path.join(tmp_scene, "views"), intr)
    dst_cloud = g3.random_sample(
        jax.random.PRNGKey(2),
        g3.backproject_depth(depth, intr, depth_min=0.01, depth_max=5.0),
        4096,
    )
    return BenchScene(
        cad_pts=cad_pts, cad_valid=cad_valid, mesh_v=mesh_v, mesh_f=mesh_f,
        T0=T0, T_obs=T_obs, depth=depth, obj_sil=depth > 0,
        estimator=estimator, dst_cloud=dst_cloud, cad_ply=cad_ply,
    )
