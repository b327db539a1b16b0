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
