"""SE(3) utilities: the pure-math layer of the reference, jit-friendly.

Covers the free functions scattered across the reference
(registration_utils.py:21-23 angular error, :284-343 PCA pre-alignment;
HelpersRealtime.py:8-43 upright snap, :226-247 camera-from-H;
template_creation.py:52-62 look-at; main_seibersdorf.py:64-67 euler->R).
All functions are pure jnp and safe under jit/vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cloud import PointCloud


_HP = jax.lax.Precision.HIGHEST


def _mm(a, b):
    """3x3-scale matmul at full precision (bf16 default would cost ~0.3% pose error)."""
    return jnp.matmul(a, b, precision=_HP)


def make_T(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    return T.at[:3, 3].set(t.reshape(3))


def inv_T(T: jnp.ndarray) -> jnp.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    return make_T(R.T, -_mm(R.T, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform to (..., 3) points (full-precision matmul)."""
    return jnp.dot(pts, T[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + T[:3, 3]


def angular_error(R_exp: jnp.ndarray, R_est: jnp.ndarray) -> jnp.ndarray:
    """Rotation geodesic distance in radians.

    Same quantity as reference registration_utils.py:21-23
    (``arccos((trace(R1^T R2)-1)/2)``), but computed via atan2 of the
    skew-part norm: arccos near 1 is ill-conditioned, putting a ~1e-3 rad
    floor on the metric in float32; atan2(sin, cos) is exact to rounding.
    """
    R = _mm(R_exp.T, R_est)
    cos = (jnp.trace(R) - 1.0) / 2.0
    skew = jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    sin = 0.5 * jnp.linalg.norm(skew)
    return jnp.abs(jnp.arctan2(sin, cos))


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], jnp.float32)


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)


def euler_xyz_to_R(rpy) -> jnp.ndarray:
    """Extrinsic x-y-z euler angles to rotation matrix.

    Matches ``scipy.spatial.transform.Rotation.from_euler("xyz", rpy)``
    (used by the reference calib loader, main_seibersdorf.py:64-67).
    """
    r, p, y = rpy[0], rpy[1], rpy[2]
    return _mm(_mm(rot_z(y), rot_y(p)), rot_x(r))


def axis_angle_to_R(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """Rodrigues formula."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    kx, ky, kz = axis[0], axis[1], axis[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]], axis.dtype)
    return jnp.eye(3, dtype=axis.dtype) + jnp.sin(angle) * K + (1 - jnp.cos(angle)) * _mm(K, K)


def random_rotation(key) -> jnp.ndarray:
    """Uniform random rotation via normalized quaternion."""
    q = jax.random.normal(key, (4,))
    q = q / jnp.linalg.norm(q)
    return quat_to_R(q)


def quat_to_R(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) to rotation matrix."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        q.dtype,
    )


def pca_axes(cloud: PointCloud):
    """Principal axes of a (masked) cloud.

    Returns ``(R, s)`` where R's columns are principal directions sorted by
    decreasing variance with det(R)=+1, and s are the singular values.
    Parity with reference registration_utils.py:290-310.
    """
    w = cloud.valid.astype(cloud.points.dtype)
    n = jnp.sum(w)
    c = cloud.centroid()
    X = (cloud.points - c) * w[:, None]
    cov = jnp.dot(X.T, X, precision=jax.lax.Precision.HIGHEST) / jnp.maximum(n - 1.0, 1.0)
    vals, vecs = jnp.linalg.eigh(cov)  # ascending
    order = jnp.argsort(-vals)
    vals = vals[order]
    R = vecs[:, order]
    # right-handedness: flip third axis if needed
    flip = jnp.where(jnp.linalg.det(R) < 0, -1.0, 1.0)
    R = R.at[:, 2].multiply(flip)
    return R, jnp.sqrt(jnp.maximum(vals, 0.0))


def initial_align_centroid_pca(src: PointCloud, dst: PointCloud) -> jnp.ndarray:
    """Rigid T0 aligning src centroid+PCA axes to dst's, with sign fixes.

    Parity with reference registration_utils.py:314-343.
    """
    c_s, c_d = src.centroid(), dst.centroid()
    R_s, _ = pca_axes(src)
    R_d, _ = pca_axes(dst)
    dots = jnp.sum(R_s * R_d, axis=0)  # per-column dot products
    signs = jnp.where(dots < 0, -1.0, 1.0)
    R_s_adj = R_s * signs[None, :]
    flip = jnp.where(jnp.linalg.det(R_s_adj) < 0, -1.0, 1.0)
    R_s_adj = R_s_adj.at[:, 2].multiply(flip)
    R0 = _mm(R_d, R_s_adj.T)
    t0 = c_d - _mm(R0, c_s)
    return make_T(R0, t0)


# 90-degree Z rotation used by the reference's upright snap (HelpersRealtime.py:37-39;
# its comment says "about X" but the matrix is a Z rotation — we reproduce the code).
_RZ90 = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def enforce_upright_pose_y_up(T: jnp.ndarray, tol_deg: float = 30.0) -> jnp.ndarray:
    """Snap the model's local +Y axis toward world -Y by repeated 90-deg rotations.

    Behavior parity with reference HelpersRealtime.py:8-43: tries
    R, R@Rz, R@Rz^2, R@Rz^3 and returns the first whose column-1 axis is within
    ``tol_deg`` of world (0,-1,0); if none qualifies, returns R unchanged
    (the reference's loop applies Rz four times, and Rz^4 == I).
    """
    R = T[:3, :3]
    world_up = jnp.array([0.0, -1.0, 0.0], R.dtype)
    cos_tol = jnp.cos(jnp.deg2rad(tol_deg))

    def candidate(k, Rk):
        up = Rk[:, 1]
        c = jnp.dot(up, world_up) / jnp.maximum(jnp.linalg.norm(up), 1e-12)
        return c >= cos_tol

    Rs = [R]
    for _ in range(3):
        Rs.append(_mm(Rs[-1], _RZ90))
    Rs = jnp.stack(Rs)  # (4, 3, 3)
    ok = jax.vmap(candidate, in_axes=(0, 0))(jnp.arange(4), Rs)
    # first qualifying index, or 0 (R unchanged) if none
    first = jnp.argmax(ok)
    idx = jnp.where(jnp.any(ok), first, 0)
    return T.at[:3, :3].set(Rs[idx])


def look_at(eye, target, up) -> jnp.ndarray:
    """World->camera transform for a right-handed camera with +Z out of the
    screen toward the viewer (OpenGL convention).

    Parity with reference template_creation.py:52-62 (``o3d_lookat``).
    """
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    z = eye - target
    z = z / jnp.maximum(jnp.linalg.norm(z), 1e-12)
    x = jnp.cross(up, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-12)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z])  # world->cam rotation
    return make_T(R, -_mm(R, eye))


def camera_eye_lookat_up_from_H(H: jnp.ndarray):
    """Model->camera H to (eye, target, up) in model/world coordinates.

    Parity with reference HelpersRealtime.py:226-247.
    """
    R = H[:3, :3]
    t = H[:3, 3]
    eye = -_mm(R.T, t)
    forward = _mm(R.T, jnp.array([0.0, 0.0, 1.0], R.dtype))
    up = _mm(R.T, jnp.array([0.0, -1.0, 0.0], R.dtype))
    up = up / (jnp.linalg.norm(up) + 1e-12)
    return eye, eye + forward, up
