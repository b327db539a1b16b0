"""Host-side visualization helpers: CAD projection overlay with axes, and the
colorama stage-timer printer.

Parity: ``draw_model_projection_with_axes`` (HelpersRealtime.py:267-297) and
``timer_print`` (main_realsense.py:21-25). Drawing stays on the host (cv2), out
of the hot path; the projection itself is the jnp kernel in geom3d.camera.
"""
from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from ..geom3d.camera import project_points


def timer_print(start_time: float, label: str) -> float:
    """Green per-stage timing print (main_realsense.py:21-25 parity)."""
    try:
        from colorama import Fore, Style

        green, reset = Fore.GREEN, Style.RESET_ALL
    except ImportError:
        green = reset = ""
    elapsed = time.time() - start_time
    print(f"{green}  {label}: {elapsed:.3f}s{reset}")
    return elapsed


def draw_correspondences(
    color: np.ndarray,
    src_pts: np.ndarray,
    dst_pts: np.ndarray,
    corr_mask: np.ndarray,
    K: np.ndarray,
    T_src=None,
    max_lines: int = 200,
) -> np.ndarray:
    """Draw correspondence lines between two clouds projected into the image.

    2-D equivalent of the reference's blocking 3-D correspondence viewers
    (registration_utils.visualize_correspondences :198-226 and the debug
    LineSet in HelpersRealtime.run_teaser :146-156) — green lines from
    projected src points (optionally pre-transformed by T_src) to their
    matched dst points. Non-blocking: draws in place and returns the image.
    """
    import cv2

    T_src = np.eye(4, dtype=np.float32) if T_src is None else np.asarray(T_src)
    uv_s, f_s = project_points(
        jnp.asarray(src_pts, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(T_src, jnp.float32),
    )
    uv_d, f_d = project_points(
        jnp.asarray(dst_pts, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.eye(4),
    )
    uv_s, uv_d = np.asarray(uv_s).astype(int), np.asarray(uv_d).astype(int)
    ok = np.asarray(corr_mask) & np.asarray(f_s) & np.asarray(f_d)
    h, w = color.shape[:2]
    drawn = 0
    for i in np.where(ok)[0]:
        a, b = uv_s[i], uv_d[i]
        if 0 <= a[0] < w and 0 <= a[1] < h and 0 <= b[0] < w and 0 <= b[1] < h:
            cv2.line(color, tuple(a), tuple(b), (0, 255, 0), 1)
            cv2.circle(color, tuple(a), 2, (0, 0, 255), -1)
            cv2.circle(color, tuple(b), 2, (255, 0, 0), -1)
            drawn += 1
            if drawn >= max_lines:
                break
    return color


def draw_model_projection_with_axes(
    color: np.ndarray,
    cad_points: np.ndarray,
    K: np.ndarray,
    T_m2c: np.ndarray,
    axis_length: float = 0.05,
) -> np.ndarray:
    """Draw projected CAD points (red dots) and the model axes (RGB) onto the
    BGR image in place; returns the image."""
    import cv2

    if not color.flags["C_CONTIGUOUS"]:
        color = np.ascontiguousarray(color)
    uv, front = project_points(
        jnp.asarray(cad_points, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(T_m2c, jnp.float32),
    )
    uv = np.asarray(uv).astype(int)
    front = np.asarray(front)
    h, w = color.shape[:2]
    for (u, v), ok in zip(uv, front):
        if ok and 0 <= u < w and 0 <= v < h:
            cv2.circle(color, (int(u), int(v)), 1, (0, 0, 255), -1)

    axes = np.array(
        [[0, 0, 0], [axis_length, 0, 0], [0, axis_length, 0], [0, 0, axis_length]],
        np.float32,
    )
    auv, afront = project_points(
        jnp.asarray(axes), jnp.asarray(K, jnp.float32), jnp.asarray(T_m2c, jnp.float32)
    )
    auv = np.asarray(auv).astype(int)
    if np.asarray(afront).all():
        o = tuple(auv[0])
        cv2.line(color, o, tuple(auv[1]), (0, 0, 255), 2)  # X red
        cv2.line(color, o, tuple(auv[2]), (0, 255, 0), 2)  # Y green
        cv2.line(color, o, tuple(auv[3]), (255, 0, 0), 2)  # Z blue
    return color
