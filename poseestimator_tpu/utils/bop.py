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


# BOP19 Average Recall (Hodan et al., "BOP Challenge 2020", ECCV 2020 §2.3 —
# the public evaluation protocol; the reference evaluates against the same
# BOP-format GT but reports only angular error, main_image.py:134).
# Correctness thresholds theta and VSD misalignment tolerances tau both sweep
# 5%..50% in 5% steps; MSPD thresholds are in pixels of a 640-wide image.
BOP_FRACS = np.arange(0.05, 0.501, 0.05)


def load_object_symmetries(
    models_info_path: str,
    obj_id: int,
    max_sym_disc_step: float = 0.01,
    max_syms: int = 512,
) -> Optional[np.ndarray]:
    """Object symmetry set from BOP ``models_info.json`` -> (S, 4, 4) mm, or
    None when the object is listed asymmetric (or absent).

    The BOP evaluation protocol (Hodan et al. ECCV 2020 §2.2) scores MSSD and
    MSPD under the object's symmetry group: ``symmetries_discrete`` is a list
    of flattened 4x4 model-to-model transforms; each entry of
    ``symmetries_continuous`` is an {axis, offset} rotation axis discretised
    so consecutive steps move a surface point at the object radius by at most
    ``max_sym_disc_step`` of the diameter (step angle 2*asin(step/2), the
    chord bound; BOP's canonical step is 0.01). Discrete and continuous
    groups are composed (Tc @ Td over the cross product, identity included),
    truncated to ``max_syms`` if the composition explodes.

    Translations in models_info are in mm, matching the mm pose convention of
    frame_metrics. The reference evaluates the same BOP-format GT but only
    reports angular error (main_image.py:134) — symmetry handling is part of
    the full challenge protocol this framework adds.
    """
    with open(models_info_path) as f:
        info = json.load(f)
    key = str(int(obj_id))
    if key not in info:
        return None
    info = info[key]
    disc = [np.eye(4)]
    for s in info.get("symmetries_discrete", []):
        disc.append(np.asarray(s, np.float64).reshape(4, 4))
    cont = [np.eye(4)]
    for s in info.get("symmetries_continuous", []):
        axis = np.asarray(s["axis"], np.float64)
        axis = axis / max(np.linalg.norm(axis), 1e-12)
        offset = np.asarray(s.get("offset", [0.0, 0.0, 0.0]), np.float64)
        step = 2.0 * np.arcsin(min(max_sym_disc_step, 2.0) / 2.0)
        n = max(2, int(np.ceil(2.0 * np.pi / step)))
        n = min(n, max(2, max_syms // max(len(disc), 1)))
        for i in range(1, n):
            ang = 2.0 * np.pi * i / n
            c, s_, C = np.cos(ang), np.sin(ang), 1.0 - np.cos(ang)
            x, y, z = axis
            R = np.array([
                [c + x * x * C, x * y * C - z * s_, x * z * C + y * s_],
                [y * x * C + z * s_, c + y * y * C, y * z * C - x * s_],
                [z * x * C - y * s_, z * y * C + x * s_, c + z * z * C],
            ])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = offset - R @ offset
            cont.append(T)
    if len(disc) == 1 and len(cont) == 1:
        return None  # asymmetric object: identity-only set
    syms = [tc @ td for tc in cont for td in disc]
    return np.asarray(syms[:max_syms], np.float32)


def frame_metrics(
    T_est_mm: np.ndarray,
    T_gt_mm: np.ndarray,
    K: np.ndarray,
    verts_mm: np.ndarray,
    intr,
    scene_depth_mm: Optional[np.ndarray] = None,
    symmetries_mm: Optional[np.ndarray] = None,
) -> dict:
    """The BOP metric family for ONE pose estimate, in the BOP mm convention.

    Shared by the offline app (apps/main_image.py) and the scene-sweep
    evaluator (tools/eval_bop.py). ``verts_mm``: CAD surface points in mm;
    ``scene_depth_mm``: the measured depth image for occlusion-aware VSD
    (None -> render-only visibility); ``symmetries_mm``: (S, 4, 4) object
    symmetry transforms from load_object_symmetries (None -> identity only;
    VSD is visibility-based and symmetry-agnostic by protocol design).
    Returns ``{add_mm, adds_mm, mssd_mm, mspd_px, vsd}`` with ``vsd`` the
    (10,) BOP tau-sweep values.
    """
    import jax.numpy as jnp

    from .. import geom3d as g3
    from ..render import vsd_multi_tau

    model = g3.from_points(np.asarray(verts_mm, np.float32))
    Te = jnp.asarray(T_est_mm, jnp.float32)
    Tg = jnp.asarray(T_gt_mm, jnp.float32)
    Kj = jnp.asarray(K, jnp.float32)
    diam_mm = float(np.linalg.norm(verts_mm.max(0) - verts_mm.min(0)))
    vsd = np.asarray(vsd_multi_tau(
        Te, Tg, model.points, model.valid, intr,
        jnp.asarray(BOP_FRACS * diam_mm, jnp.float32),
        scene_depth=None if scene_depth_mm is None
        else jnp.asarray(scene_depth_mm),
        delta=15.0, near=1.0, far=100000.0,  # BOP visibility delta; mm clips
    ))
    syms = None if symmetries_mm is None else jnp.asarray(
        symmetries_mm, jnp.float32)
    return {
        "add_mm": float(g3.add_metric(Te, Tg, model)),
        "adds_mm": float(g3.adds_metric(Te, Tg, model)),
        "mssd_mm": float(g3.mssd_metric(Te, Tg, model, symmetries=syms)),
        "mspd_px": float(g3.mspd_metric(Te, Tg, Kj, model, symmetries=syms)),
        "vsd": vsd,
        "diameter_mm": diam_mm,
    }


def bop_average_recall(
    vsd: np.ndarray,
    mssd: np.ndarray,
    mspd: np.ndarray,
    diameter: float,
    image_width: int = 640,
) -> dict:
    """BOP19 Average Recall over a set of pose estimates.

    ``vsd``: (F, 10) VSD values per frame at tau = 5%..50% of ``diameter``
    (render once per frame via render.vsd_multi_tau); ``mssd``: (F,) max
    surface distances in meters; ``mspd``: (F,) max projection distances in
    pixels; ``diameter`` in meters. Returns the three per-metric recalls and
    their mean (the challenge's headline AR score), all in [0, 1]:

    - AR_VSD  = mean over (tau, theta) of recall[VSD_tau < theta],
      theta in 5%..50%;
    - AR_MSSD = mean over theta in (5%..50%) * diameter of recall[MSSD < theta];
    - AR_MSPD = mean over theta in (5..50) * r px, r = image_width / 640,
      of recall[MSPD < theta].
    """
    vsd = np.asarray(vsd, np.float64)
    if vsd.ndim != 2 or vsd.shape[1] != len(BOP_FRACS):
        raise ValueError(
            f"vsd must be (F, {len(BOP_FRACS)}) — one column per BOP tau; "
            f"got {vsd.shape}"
        )
    mssd = np.asarray(mssd, np.float64)
    mspd = np.asarray(mspd, np.float64)
    # (F, T) < (theta,) -> broadcast to (F, T, theta), mean over everything
    ar_vsd = float(np.mean(vsd[:, :, None] < BOP_FRACS[None, None, :]))
    ar_mssd = float(np.mean(mssd[:, None] < BOP_FRACS[None, :] * diameter))
    r = image_width / 640.0
    ar_mspd = float(np.mean(mspd[:, None] < BOP_FRACS[None, :] * 100.0 * r))
    return {
        "ar_vsd": round(ar_vsd, 4),
        "ar_mssd": round(ar_mssd, 4),
        "ar_mspd": round(ar_mspd, 4),
        "bop_ar": round((ar_vsd + ar_mssd + ar_mspd) / 3.0, 4),
    }
