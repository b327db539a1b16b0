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


def make_icosphere(radius: float = 1.0, subdivisions: int = 3,
                   center=(0.0, 0.0, 0.0)) -> TriangleMesh:
    """Subdivided icosahedron — analytic-parity fixture for the rasterizer
    (ray-sphere depth is closed-form) and a primitive CAD for the
    renderer-independent eval instrument. Facet sagitta error is about
    ``r * theta^2 / 8`` with theta ~ 1.1 / 2^subdivisions rad."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdivisions):
        cache: dict[tuple[int, int], int] = {}
        verts = list(v)

        def midpoint(a: int, b: int) -> int:
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = verts[a] + verts[b]
                verts.append(m / np.linalg.norm(m))
                cache[key] = len(verts) - 1
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf, np.int64)
    v = (v * radius + np.asarray(center, np.float64)).astype(np.float32)
    m = TriangleMesh(vertices=v, faces=f.astype(np.int32))
    m.compute_vertex_normals()
    return m


def simplify_vertex_clustering(mesh: TriangleMesh, voxel: float) -> TriangleMesh:
    """Decimate by snapping vertices to a ``voxel`` grid and merging — the
    face-budget cap for raster passes whose cost scales with face count
    (Open3D ``simplify_vertex_clustering`` semantics: representative =
    cluster mean; degenerate faces dropped)."""
    keys = np.floor(mesh.vertices / voxel).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    reps = np.zeros((len(counts), 3), np.float64)
    np.add.at(reps, inv, mesh.vertices.astype(np.float64))
    reps = (reps / counts[:, None]).astype(np.float32)
    f = inv[mesh.faces]
    keep = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    out = TriangleMesh(vertices=reps, faces=f[keep].astype(np.int32))
    if len(out.faces):
        out.compute_vertex_normals()
    return out


def decimate_to_faces(mesh: TriangleMesh, max_faces: int,
                      iters: int = 12) -> TriangleMesh:
    """Decimate (vertex clustering, geometric bisection on the voxel size)
    until the face count fits ``max_faces`` — the raster passes' face budget
    (their cost is linear in faces)."""
    if len(mesh.faces) <= max_faces:
        return mesh
    diag = float(np.linalg.norm(mesh.extent))
    lo, hi = diag * 1e-3, diag * 0.5
    best = None
    for _ in range(iters):
        mid = float(np.sqrt(lo * hi))
        dec = simplify_vertex_clustering(mesh, mid)
        if len(dec.faces) > max_faces:
            lo = mid  # too fine -> coarser voxel
        else:
            if len(dec.faces) > 0:
                best = dec
            hi = mid  # fits (or collapsed to nothing) -> try finer
    if best is None:
        raise ValueError(f"could not decimate to <= {max_faces} faces")
    return best


def pad_faces(faces: np.ndarray, capacity: int) -> np.ndarray:
    """Pad a face list to a fixed capacity with degenerate (0,0,0) triples —
    zero-area faces never cover a pixel, so padded rasterization is exact."""
    if len(faces) > capacity:
        raise ValueError(f"{len(faces)} faces exceed capacity {capacity}")
    out = np.zeros((capacity, 3), np.int32)
    out[: len(faces)] = faces
    return out


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
