"""Offline single-frame 6D pose evaluation against BOP ground truth.

CLI parity with reference src/pose_estimator/main_image.py (run as
``python -m poseestimator_tpu.apps.main_image``): detect the object mask with
YOLO, build the masked point cloud from the BOP depth + scene_camera.json,
match against the template DB (offline registration flavor), report the
angular error vs scene_gt.json, and project the CAD into the image. The
reference's module-level constant paths become flags with the same defaults;
``--headless`` replaces the blocking visualizations.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import jax.numpy as jnp
import numpy as np

from .. import geom3d as g3
from ..geom3d.cloud import from_points
from ..pipeline.detector import detect_mask
from ..pipeline.offline import find_best_template_teaser
from ..utils.bop import get_pointcloud, load_camera_intrinsics, load_scene_gt
from ..utils.overlay import draw_model_projection_with_axes
from ..utils.plyio import read_ply


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default="./data/best.pt")
    p.add_argument("--rgb", default="./data/000000.jpg")
    p.add_argument("--depth", default="./data/000000.png")
    p.add_argument("--scene-camera", default="./data/scene_camera.json")
    p.add_argument("--templates", default="./data/lego_views/")
    p.add_argument("--scene-gt", default="./data/scene_gt.json")
    p.add_argument("--ply", default="./data/obj_000001.ply")
    p.add_argument("--target-points", type=int, default=400)  # main_image.py:68
    p.add_argument("--nc", type=int, default=5)
    p.add_argument("--class-id", type=int, default=0)
    p.add_argument("--headless", action="store_true", help="no GUI windows")
    p.add_argument("--save-overlay", default=None, help="write overlay png here")
    p.add_argument("--models-info", default=None,
                   help="BOP models_info.json for symmetry-aware MSSD/MSPD "
                        "(default: auto-detect next to --ply)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import cv2

    mask = detect_mask(args.weights, args.rgb, class_id=args.class_id, nc=args.nc)
    color = cv2.imread(args.rgb)

    ply_files = sorted(glob.glob(os.path.join(args.templates, "*.ply")))
    src_clouds = []
    for f in ply_files:
        v = read_ply(f).vertices
        src_clouds.append(from_points(v))
        print(f"Loaded: {f} with {len(v)} points")

    dst_cloud, K = get_pointcloud(args.depth, args.rgb, args.scene_camera, mask=mask)
    if dst_cloud is None or int(dst_cloud.count()) == 0:
        print("Failed to generate scene point cloud!")
        return 1
    K = np.asarray(K).reshape(3, 3)

    best_idx, H, best_score, all_metrics = find_best_template_teaser(
        dst_cloud, src_clouds, target_points=args.target_points
    )
    for m in all_metrics:
        print(f"Template {m['template_idx']}: Chamfer = {m['score']:.6f}")
    print(best_idx)

    # m -> mm translation for BOP comparison (main_image.py:89)
    T_est = np.asarray(H, np.float64).copy()
    T_est[:3, 3] *= 1000.0
    R_est = T_est[:3, :3]

    if os.path.exists(args.scene_gt):
        T_gt, gt_obj_id = load_scene_gt(args.scene_gt)
        print("Homogeneous Transformation:\n", T_gt)
        print("Estimated: ", T_est)
        ang = float(
            g3.angular_error(jnp.asarray(T_gt[:3, :3], jnp.float32),
                             jnp.asarray(R_est, jnp.float32))
        )
        print("Difference = ", ang)
        # BOP metric family on the CAD surface (mm, matching the BOP GT
        # convention; symmetry-aware MSSD/MSPD when models_info.json is
        # available) + occlusion-aware VSD over the BOP19 tau sweep + the
        # single-frame Average Recall
        from ..utils.bop import (bop_average_recall, frame_metrics,
                                 load_object_symmetries)

        mi_path = args.models_info or os.path.join(
            os.path.dirname(os.path.abspath(args.ply)), "models_info.json")
        syms = None
        if os.path.exists(mi_path):
            syms = load_object_symmetries(mi_path, gt_obj_id)
            if syms is not None:
                print(f"Symmetry set: {len(syms)} transforms "
                      f"(obj {gt_obj_id}, {os.path.basename(mi_path)})")

        verts = np.asarray(read_ply(args.ply).vertices, np.float32)
        if float(np.max(verts.max(0) - verts.min(0))) < 1.0:
            # meter-scale CAD -> mm, matching the mm-convention poses above
            # (inverse of templates/creation.py's mm -> m autoscale rule)
            verts = verts * 1000.0
        depth_raw = cv2.imread(args.depth, cv2.IMREAD_UNCHANGED)
        h_img, w_img = depth_raw.shape[:2]
        _, depth_scale, _ = load_camera_intrinsics(
            args.scene_camera, 0, w_img, h_img
        )
        intr_r = g3.Intrinsics(
            fx=float(K[0, 0]), fy=float(K[1, 1]),
            cx=float(K[0, 2]), cy=float(K[1, 2]), width=w_img, height=h_img,
        )
        fm = frame_metrics(
            T_est, T_gt, K, verts, intr_r,
            scene_depth_mm=depth_raw.astype(np.float32) * depth_scale,
            symmetries_mm=syms,
        )
        print(f"ADD = {fm['add_mm']:.3f} mm, ADD-S = {fm['adds_mm']:.3f} mm, "
              f"MSSD = {fm['mssd_mm']:.3f} mm, MSPD = {fm['mspd_px']:.2f} px")
        ar = bop_average_recall(
            fm["vsd"][None], np.asarray([fm["mssd_mm"]]),
            np.asarray([fm["mspd_px"]]),
            diameter=fm["diameter_mm"], image_width=w_img,
        )
        print(f"VSD(tau=10%) = {fm['vsd'][1]:.4f}, BOP AR = {ar['bop_ar']:.4f} "
              f"(VSD {ar['ar_vsd']:.4f} / MSSD {ar['ar_mssd']:.4f} / "
              f"MSPD {ar['ar_mspd']:.4f})")

    cad = read_ply(args.ply)
    overlay = draw_model_projection_with_axes(
        color.copy(), cad.vertices, K, T_est.astype(np.float32), axis_length=50.0
    )
    if args.save_overlay:
        cv2.imwrite(args.save_overlay, overlay)
    if not args.headless:
        cv2.imshow("Live Tracking", overlay)
        cv2.waitKey(0)
        cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
