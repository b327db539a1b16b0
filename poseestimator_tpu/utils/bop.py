"""BOP-format I/O: scene_camera.json intrinsics, scene_gt.json poses, and the
depth+mask -> point cloud loader of the offline eval path.

Parity with reference registration_utils.py:26-95 (load_camera_intrinsics,
get_pointcloud: depth png / 1000 * depth_scale, mask, 0.01-10 m clip,
statistical outlier removal) and main_image.py:98-115 (GT parsing).
"""
from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom3d as g3
from ..geom3d.cloud import PointCloud


def load_camera_intrinsics(scene_camera_path: str, frame_id, image_width, image_height):
    """-> (Intrinsics, depth_scale, cam_K list) from BlenderProc camera data."""
    if isinstance(frame_id, int):
        frame_id = f"{frame_id}"
    with open(scene_camera_path) as f:
        cam_data = json.load(f)
    if frame_id not in cam_data:
        raise ValueError(f"Frame ID {frame_id} not found in scene_camera.json")
    cam_K = cam_data[frame_id]["cam_K"]
    intr = g3.Intrinsics(
        fx=float(cam_K[0]), fy=float(cam_K[4]), cx=float(cam_K[2]), cy=float(cam_K[5]),
        width=int(image_width), height=int(image_height),
    )
    return intr, float(cam_data[frame_id]["depth_scale"]), cam_K


def get_pointcloud(depth_path, rgb_path, scene_camera_path, mask, frame_id=0,
                   capacity: int = 16384):
    """Masked BOP frame -> (PointCloud, K 3x3). Returns (None, None) when the
    mask selects nothing (reference behavior at registration_utils.py:62-64,
    normalized to a uniform tuple so callers can unpack)."""
    import cv2

    depth_raw = cv2.imread(str(depth_path), cv2.IMREAD_UNCHANGED)
    if depth_raw is None:
        raise FileNotFoundError(depth_path)
    depth_m = depth_raw.astype(np.float32) / 1000.0
    binary = (np.asarray(mask) == 255).astype(np.uint8)
    if binary.sum() == 0:
        print("WARNING: No pixels selected by mask!")
        return None, None

    h, w = depth_m.shape
    intr, depth_scale, cam_K = load_camera_intrinsics(scene_camera_path, frame_id, w, h)
    depth_m = depth_m * depth_scale

    color = None
    if rgb_path is not None:
        bgr = cv2.imread(str(rgb_path))
        if bgr is not None:
            color = jnp.asarray(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))

    cloud = g3.backproject_depth(
        jnp.asarray(depth_m), intr, color=color, mask=jnp.asarray(binary),
        depth_min=0.01, depth_max=10.0,
    )
    # stratified sample, not compact(): masks larger than `capacity` pixels
    # would otherwise lose their raster-bottom slice
    cloud = g3.random_sample(jax.random.PRNGKey(0), cloud, capacity)
    cloud = g3.remove_statistical_outlier(cloud, nb_neighbors=20, std_ratio=1.0)
    K = np.asarray(cam_K, np.float64).reshape(3, 3)
    return cloud, K


def load_scene_gt(scene_gt_path: str, frame_key: Optional[str] = None, obj_index: int = 0):
    """First (or chosen) GT pose from scene_gt.json -> (T 4x4 m2c, obj_id).

    Parity with main_image.py:98-115: rotation 3x3 row-major, translation in
    the file's units (mm in BOP)."""
    with open(scene_gt_path) as f:
        data = json.load(f)
    key = frame_key if frame_key is not None else sorted(data.keys())[0]
    obj = data[key][obj_index]
    R = np.asarray(obj["cam_R_m2c"], np.float64).reshape(3, 3)
    t = np.asarray(obj["cam_t_m2c"], np.float64).reshape(3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T, int(obj.get("obj_id", -1))
