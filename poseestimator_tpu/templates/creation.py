"""Template database generation: render canonical views of a CAD model and
back-project each to a world-frame point-cloud template.

Behavior parity with reference template_creation.py:139-250 (geometry and
artifact contract):
  - mm -> m autoscale when the bbox extent exceeds 1 (template_creation.py:
    155-160), centering at the vertex mean (:168-170),
  - the 5-view camera ring at distance 2x bbox diagonal — edge views
    '6','7','8' and corner views '11','12' with up=(0,1,0)
    (get_reduced_camera_positions, :98-130),
  - 640x480 FoV-60 intrinsics (:188-191), near=0.001, far=3x distance (:205),
  - per view: depth render -> back-project -> sample to <= 10k points
    (:234) -> camera-to-world -> un-center (:242-244),
  - artifacts ``pcd_cam_{i:02d}_{type}.ply`` + ``rgb_{i:02d}_{type}.png``.

The Filament mesh render is replaced by the exact triangle rasterizer
(render.raster — same z-buffer-over-true-faces semantics as Filament's
depth pass); the view-space-flip + inverse-extrinsic chain of the
reference collapses because we render directly in the vision camera
convention.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom3d.camera import Intrinsics, backproject_depth
from ..geom3d.cloud import PointCloud, from_points, to_numpy
from ..geom3d.sampling import random_sample
from ..geom3d.se3 import inv_T, look_at
from ..render.mesh import TriangleMesh, decimate_to_faces
from ..render.raster import render_depth_mesh, shade_depth_image
from ..utils.plyio import write_ply

# OpenGL-camera (look_at output, -z forward) to vision-camera (+z forward)
_GL_TO_CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)

TEMPLATE_IMAGE_SIZE = (640, 480)
TEMPLATE_FOV_DEG = 60.0
TEMPLATE_MAX_POINTS = 10_000


def _positions_from_dirs(dirs, distance):
    out = []
    for d, name in dirs:
        d = np.asarray(d, np.float64)
        d = d / np.linalg.norm(d)
        # up +Y except for poles, where +Y is degenerate
        up = np.array([0.0, 0.0, 1.0]) if abs(d[1]) > 0.99 else np.array([0.0, 1.0, 0.0])
        out.append(
            {"eye": d * distance, "target": np.zeros(3), "up": up, "type": name}
        )
    return out


def get_reduced_camera_positions(distance: float, center=None):
    """The reference's 5 active views (template_creation.py:98-130): 3 edge
    directions and 2 corner directions, normalized to ``distance``, target at
    the origin, up +Y."""
    dirs = [
        (np.array([0.0, 1.0, 1.0]), "6"),
        (np.array([0.0, -1.0, 1.0]), "7"),
        (np.array([1.0, 0.0, 1.0]), "8"),
        (np.array([1.0, 1.0, 1.0]), "11"),
        (np.array([1.0, -1.0, 1.0]), "12"),
    ]
    return _positions_from_dirs(dirs, distance)


def get_full_camera_positions(distance: float, center=None):
    """Full 26-view icosahedron-like coverage: 6 faces + 12 edges + 8 corners
    of the view cube (the reference's commented-out face/edge/corner sets,
    template_creation.py:74-131, completed). Use for objects observed from
    arbitrary directions — the 5-view reduced set only covers an upper arc.
    """
    dirs = []
    i = 0
    for x in (-1, 0, 1):
        for y in (-1, 0, 1):
            for z in (-1, 0, 1):
                if x == y == z == 0:
                    continue
                dirs.append((np.array([float(x), float(y), float(z)]), f"f{i}"))
                i += 1
    return _positions_from_dirs(dirs, distance)


VIEW_SETS = {
    "reduced": get_reduced_camera_positions,
    "full": get_full_camera_positions,
}


def render_templates(
    mesh_path: str,
    output_dir: str,
    synthetic_rendering: str = "Random",
    seed: int = 0,
    view_set: str = "reduced",
) -> list[str]:
    """Generate the template DB for ``mesh_path`` into ``output_dir``.

    Returns the list of written .ply paths (sorted by view index). CLI parity
    with reference render_templates(mesh_path, output_dir).
    """
    if not os.path.exists(mesh_path):
        raise FileNotFoundError(f"Could not find {mesh_path}")
    mesh = TriangleMesh.load(mesh_path)

    size = mesh.extent
    if np.max(size) >= 1.0:  # heuristically in millimeters -> scale to meters
        mesh = mesh.scale(0.001, center=np.zeros(3))

    diag = float(np.linalg.norm(mesh.extent))
    distance = diag * 2.0
    trans_center = mesh.get_center()
    mesh = mesh.translate(-trans_center)

    # exact triangle raster (Filament-parity surface rendering): template
    # clouds back-projected from it carry no splat depth bias; color for the
    # PNG artifacts is shaded from depth gradients
    rmesh = decimate_to_faces(mesh, 16384)
    mesh_v = jnp.asarray(rmesh.vertices)
    mesh_f = jnp.asarray(rmesh.faces)

    w, h = TEMPLATE_IMAGE_SIZE
    intr = Intrinsics.from_fov(TEMPLATE_FOV_DEG, w, h)
    near, far = 0.001, distance * 3.0

    os.makedirs(output_dir, exist_ok=True)
    written = []
    key = jax.random.PRNGKey(seed)
    for i, cam in enumerate(VIEW_SETS[view_set](distance)):
        T_gl = look_at(cam["eye"], cam["target"], cam["up"])  # world -> GL cam
        T_cv = jnp.asarray(_GL_TO_CV) @ T_gl  # world -> vision cam
        depth = render_depth_mesh(
            mesh_v, mesh_f, T_cv, intr, near=near, far=far
        )
        rgb = shade_depth_image(depth, intr)

        cloud = backproject_depth(depth, intr, depth_min=near, depth_max=far)
        key, k = jax.random.split(key)
        # sample straight from the full back-projection (an intermediate
        # compact() would truncate raster-bottom pixels of close-up views)
        cloud = random_sample(k, cloud, TEMPLATE_MAX_POINTS)
        # camera -> world, then undo the centering
        cloud = cloud.transform(inv_T(T_cv)).translate(jnp.asarray(trans_center))

        name = f"{i:02d}_{cam['type']}"
        ply_path = os.path.join(output_dir, f"pcd_cam_{name}.ply")
        write_ply(ply_path, to_numpy(cloud))
        written.append(ply_path)

        rgb_path = os.path.join(output_dir, f"rgb_{name}.png")
        _write_png(rgb_path, np.asarray(rgb))
    # sidecar records which view set this DB is (load_templates validates a
    # requested view set against it instead of silently loading a mismatched
    # count — advisor r4: --view-set full no-opped on a dir holding the
    # 5-view reduced set)
    with open(os.path.join(output_dir, "view_set.txt"), "w") as f:
        f.write(view_set + "\n")
    return written


def _write_png(path: str, rgb01: np.ndarray) -> None:
    import cv2

    bgr = (np.clip(rgb01[..., ::-1], 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(path, bgr)


# --- synthetic depth-noise injectors -----------------------------------------
# Parity with the reference's (unused-in-pipeline) augmenters
# template_creation.py:11-30; SURVEY.md section 5 assigns them the role of
# fault-injection test fixtures, which is how tests here use them.


def add_depth_noise(depth, sigma: float = 0.002, prob_missing: float = 0.0,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Gaussian depth noise + optional random dropouts (holes)."""
    rng = rng or np.random.default_rng(0)
    d = np.asarray(depth, np.float32)
    noisy = d + rng.normal(0.0, sigma, d.shape)
    if prob_missing > 0:
        noisy = np.where(rng.random(d.shape) < prob_missing, 0.0, noisy)
    return np.clip(noisy, 0.0, None).astype(np.float32)


def add_depth_dependent_noise(depth, base_sigma: float = 0.001,
                              rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Noise growing quadratically with distance (stereo-like error model)."""
    rng = rng or np.random.default_rng(0)
    d = np.asarray(depth, np.float32)
    sigma = base_sigma * d * d
    noisy = d + rng.normal(0.0, 1.0, d.shape) * sigma
    return np.clip(noisy, 0.0, None).astype(np.float32)
