"""Triangle-mesh utilities: loading, bounds, area-weighted surface sampling.

Replaces the mesh half of the Open3D surface the reference consumes:
``read_triangle_mesh`` + ``compute_vertex_normals`` (PoseEstimator.py:29-30),
``sample_points_uniformly`` (main_realsense.py:38, template_creation.py:137),
bbox/center/scale/translate (template_creation.py:150-170).
Loading/sampling are host-side setup (numpy); the sampled points then live on
device for the render/registration hot path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..utils.plyio import PlyData, read_ply


@dataclass
class TriangleMesh:
    vertices: np.ndarray  # (V, 3) float32
    faces: np.ndarray  # (F, 3) int32
    vertex_normals: Optional[np.ndarray] = None  # (V, 3)

    @classmethod
    def load(cls, path: str) -> "TriangleMesh":
        ply = read_ply(path)
        if ply.faces is None:
            raise ValueError(f"{path}: no faces — not a triangle mesh")
        m = cls(vertices=ply.vertices, faces=ply.faces, vertex_normals=ply.normals)
        if m.vertex_normals is None:
            m.compute_vertex_normals()
        return m

    def compute_vertex_normals(self) -> None:
        v, f = self.vertices, self.faces
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        vn = np.zeros_like(v)
        for k in range(3):
            np.add.at(vn, f[:, k], fn)
        norms = np.linalg.norm(vn, axis=1, keepdims=True)
        self.vertex_normals = (vn / np.maximum(norms, 1e-12)).astype(np.float32)

    # --- bounds / transforms (Open3D-surface parity) ---
    @property
    def min_bound(self) -> np.ndarray:
        return self.vertices.min(axis=0)

    @property
    def max_bound(self) -> np.ndarray:
        return self.vertices.max(axis=0)

    @property
    def extent(self) -> np.ndarray:
        return self.max_bound - self.min_bound

    def get_center(self) -> np.ndarray:
        """Mean of vertices (Open3D TriangleMesh.get_center semantics)."""
        return self.vertices.mean(axis=0)

    def scale(self, s: float, center=None) -> "TriangleMesh":
        c = np.zeros(3, np.float32) if center is None else np.asarray(center, np.float32)
        return TriangleMesh(
            vertices=((self.vertices - c) * s + c).astype(np.float32),
            faces=self.faces,
            vertex_normals=self.vertex_normals,
        )

    def translate(self, t) -> "TriangleMesh":
        return TriangleMesh(
            vertices=(self.vertices + np.asarray(t, np.float32)).astype(np.float32),
            faces=self.faces,
            vertex_normals=self.vertex_normals,
        )

    def face_areas(self) -> np.ndarray:
        v, f = self.vertices, self.faces
        return 0.5 * np.linalg.norm(
            np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]]), axis=1
        )

    def sample_points_uniformly(
        self, number_of_points: int, rng: Optional[np.random.Generator] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Area-weighted uniform surface sampling.

        Returns (points (N, 3) float32, normals (N, 3) float32). Same sampling
        law as Open3D ``sample_points_uniformly``.
        """
        rng = rng or np.random.default_rng(0)
        areas = self.face_areas()
        total = areas.sum()
        if total <= 0:
            raise ValueError("mesh has zero surface area")
        p = areas / total
        fidx = rng.choice(len(self.faces), size=number_of_points, p=p)
        # uniform barycentric coordinates
        r1 = np.sqrt(rng.random(number_of_points))
        r2 = rng.random(number_of_points)
        w0, w1, w2 = 1.0 - r1, r1 * (1.0 - r2), r1 * r2
        f = self.faces[fidx]
        v = self.vertices
        pts = (
            v[f[:, 0]] * w0[:, None] + v[f[:, 1]] * w1[:, None] + v[f[:, 2]] * w2[:, None]
        ).astype(np.float32)
        if self.vertex_normals is None:
            self.compute_vertex_normals()
        vn = self.vertex_normals
        nrm = (
            vn[f[:, 0]] * w0[:, None] + vn[f[:, 1]] * w1[:, None] + vn[f[:, 2]] * w2[:, None]
        )
        nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
        return pts, nrm.astype(np.float32)


def load_geometry(path: str):
    """Load a PLY as a mesh when it has faces, else as a raw point set.

    Mirrors the reference's dual use of .ply files (CAD meshes and template
    clouds)."""
    ply = read_ply(path)
    if ply.faces is not None and len(ply.faces) > 0:
        m = TriangleMesh(vertices=ply.vertices, faces=ply.faces, vertex_normals=ply.normals)
        if m.vertex_normals is None:
            m.compute_vertex_normals()
        return m
    return ply
