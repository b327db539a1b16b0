"""Template database: disk cache contract + padded on-device stack.

Parity with reference PoseEstimator.load_templates (PoseEstimator.py:45-82):
glob ``*.ply`` under the template dir sorted by name; if none exist,
auto-render from the CAD mesh (render_templates) and re-glob. Templates are
then stacked into one padded ``(T, N_max, 3)`` device array so template search
vmaps over the template axis (SURVEY.md section 5: the capacity axis of this
framework is point/template batching).
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..geom3d.cloud import PointCloud
from ..utils.plyio import read_ply
from .creation import render_templates


@dataclass
class TemplateDB:
    points: jnp.ndarray  # (T, N_max, 3)
    valid: jnp.ndarray  # (T, N_max)
    paths: list[str]

    @property
    def count(self) -> int:
        return self.points.shape[0]

    def cloud(self, i: int) -> PointCloud:
        return PointCloud(points=self.points[i], valid=self.valid[i])


def load_templates(
    pcd_path: str, cad_path: str, capacity: int | None = None,
    view_set: str = "reduced",
) -> TemplateDB:
    """Load (or render, if missing) the template DB.

    ``capacity``: per-template padded point budget; defaults to the largest
    template size rounded up to a multiple of 1024.
    """
    ply_files = sorted(glob.glob(os.path.join(pcd_path, "*.ply")))
    sidecar = os.path.join(pcd_path, "view_set.txt")
    if ply_files and os.path.exists(sidecar):
        with open(sidecar) as f:
            have = f.read().strip()
        if have != view_set:
            # the dir holds a DB WE rendered for a different view set
            # (advisor r4: view_set='full' silently searched the 5-view
            # reduced DB); drop only the auto-rendered artifacts and re-render
            for pat in ("pcd_cam_*.ply", "rgb_*.png"):
                for p in glob.glob(os.path.join(pcd_path, pat)):
                    os.remove(p)
            os.remove(sidecar)
            ply_files = sorted(glob.glob(os.path.join(pcd_path, "*.ply")))
    if not ply_files:
        render_templates(mesh_path=cad_path, output_dir=pcd_path, view_set=view_set)
        ply_files = sorted(glob.glob(os.path.join(pcd_path, "*.ply")))
    if not ply_files:
        raise FileNotFoundError(f"no templates in {pcd_path} and rendering produced none")
    expected = {"reduced": 5, "full": 26}.get(view_set)
    if (expected is not None and len(ply_files) != expected
            and not os.path.exists(sidecar)):
        # user-supplied dirs are the contract (any *.ply set loads), but a
        # count mismatch against the REQUESTED view set deserves a warning
        import warnings

        warnings.warn(
            f"{pcd_path}: {len(ply_files)} templates found but view_set="
            f"{view_set!r} implies {expected}; loading the files as-is",
            stacklevel=2,
        )

    clouds = []
    for f in ply_files:
        v = read_ply(f).vertices
        if len(v) == 0:
            raise ValueError(f"Empty point cloud: {f}")
        clouds.append(v)

    n_max = max(len(c) for c in clouds)
    if capacity is None:
        capacity = -(-n_max // 1024) * 1024
    if capacity < n_max:
        raise ValueError(f"capacity {capacity} < largest template {n_max}")

    pts = np.zeros((len(clouds), capacity, 3), np.float32)
    val = np.zeros((len(clouds), capacity), bool)
    for i, c in enumerate(clouds):
        pts[i, : len(c)] = c
        val[i, : len(c)] = True
    return TemplateDB(points=jnp.asarray(pts), valid=jnp.asarray(val), paths=ply_files)
