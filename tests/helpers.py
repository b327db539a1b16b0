"""Shared synthetic fixtures: meshes and camera trajectories."""
import numpy as np

from poseestimator_tpu.render import TriangleMesh


def box_mesh_geom(sx, sy, sz, center=(0.0, 0.0, 0.0)):
    c = np.asarray(center, np.float32)
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    corners = (
        np.array(
            [
                [sx_ * hx, sy_ * hy, sz_ * hz]
                for sx_ in (-1, 1)
                for sy_ in (-1, 1)
                for sz_ in (-1, 1)
            ],
            np.float32,
        )
        + c
    )
    quads = [
        (0, 1, 3, 2), (6, 7, 5, 4), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    faces = []
    for a, b, cc, d in quads:
        faces += [[a, b, cc], [a, cc, d]]
    return corners, np.asarray(faces, np.int32)


def box_mesh(sx=0.1, sy=0.06, sz=0.04, center=(0, 0, 0)) -> TriangleMesh:
    v, f = box_mesh_geom(sx, sy, sz, center)
    return TriangleMesh(vertices=v, faces=f)


def l_shape_mesh(scale=1.0) -> TriangleMesh:
    """Asymmetric L-shaped solid (two fused boxes) — unique pose, unlike a
    plain box whose symmetry group confounds registration tests."""
    v1, f1 = box_mesh_geom(0.6 * scale, 0.2 * scale, 0.2 * scale)
    v2, f2 = box_mesh_geom(0.2 * scale, 0.4 * scale, 0.2 * scale,
                           center=(-0.2 * scale, 0.3 * scale, 0.0))
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])
    return TriangleMesh(vertices=v, faces=f)


def write_mesh(path, mesh: TriangleMesh):
    from poseestimator_tpu.utils import write_ply

    write_ply(str(path), mesh.vertices, faces=mesh.faces)
    return str(path)
