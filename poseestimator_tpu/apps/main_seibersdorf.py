"""LiDAR + RGB 6D pose estimation with an extrinsic calibration.

CLI parity with reference src/pose_estimator/main_seibersdorf.py: load the
calib YAML (K, D, and T or xyz+rpy), project the LiDAR cloud into the RGB
image with Brown-Conrady distortion, colorize and mask-filter the cloud,
statistical-outlier clean it, run the PoseEstimator template search, and
compose ``T_m2c = inv(T) @ H``. The hardcoded data paths of the reference
(:215-220) become flags; ``--headless`` replaces the blocking viewers.
"""
from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np
import yaml

from .. import geom3d as g3
from ..geom3d.cloud import from_points
from ..pipeline import Detector, PoseEstimator
from ..utils.overlay import draw_model_projection_with_axes
from ..utils.plyio import read_ply


def load_calib(path):
    """K, D, T loader (main_seibersdorf.py:55-68 parity: T, or xyz+rpy
    extrinsic euler angles)."""
    with open(path) as f:
        c = yaml.safe_load(f)
    K = np.asarray(c["K"], float).reshape(3, 3)
    D = np.asarray(c.get("D", []), float).reshape(-1)
    if "T" in c:
        T = np.asarray(c["T"], float).reshape(4, 4)
    else:
        assert "xyz" in c and "rpy" in c, "calib.yaml must have T or (xyz+rpy)"
        T = np.eye(4)
        T[:3, :3] = np.asarray(
            g3.euler_xyz_to_R(jnp.asarray(c["rpy"], jnp.float32)), np.float64
        )
        T[:3, 3] = np.asarray(c["xyz"], float)
    return K, D, T


def project_count(pts, R, t, K, D, W, H):
    """Distorted projection + in-image bookkeeping (main_seibersdorf.py:70-81)."""
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    uv, front = g3.project_points_distorted(
        jnp.asarray(pts, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(D if D.size in (4, 5, 8) else np.zeros(5), jnp.float32),
        jnp.asarray(T, jnp.float32),
    )
    uv = np.asarray(uv)
    front = np.asarray(front) & (pts @ R.T[:, 2] + t[2] > 0.1)
    uvi = np.round(uv).astype(np.int64)
    in_img = front & (uvi[:, 0] >= 0) & (uvi[:, 0] < W) & (uvi[:, 1] >= 0) & (uvi[:, 1] < H)
    return int(in_img.sum()), front, uvi, in_img


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default="./data/best.pt")
    p.add_argument("--ply-path", default="./data/seibersdorf_views/")
    p.add_argument("--cad-path", default="./data/_Daten_Seibersdorf_Patrick/ConcreteBlock.ply")
    p.add_argument("--image", required=True)
    p.add_argument("--cloud", required=True)
    p.add_argument("--calib", required=True)
    p.add_argument("--max-points", type=int, default=250000)
    p.add_argument("--target-points", type=int, default=500)
    p.add_argument("--nc", type=int, default=5)
    p.add_argument("--headless", action="store_true")
    p.add_argument("--save-overlay", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import cv2

    K, D, T = load_calib(args.calib)
    img_bgr = cv2.imread(args.image, cv2.IMREAD_COLOR)
    if img_bgr is None:
        raise SystemExit(f"Failed to read image: {args.image}")
    img = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    H_img, W_img = img.shape[:2]

    intr = g3.Intrinsics.from_K(K, W_img, H_img)
    estimator = PoseEstimator(args.cad_path, args.ply_path, intr, K, args.target_points)
    detector = Detector(args.weights, nc=args.nc)

    cad_points, _ = estimator.mesh.sample_points_uniformly(1000)

    detections = detector.detect_mask(img_bgr)
    print(f"{len(detections)} detections")
    if len(detections) == 0:
        raise SystemExit("no detections")
    mask = detections[0]["mask"]

    ply = read_ply(args.cloud)
    pts = ply.vertices.astype(np.float64)
    if args.max_points and len(pts) > args.max_points:
        pts = pts[np.random.default_rng(0).choice(len(pts), args.max_points, replace=False)]

    T_inv = np.linalg.inv(T)
    Rinv, tinv = T_inv[:3, :3], T_inv[:3, 3]
    n_in, front, uv, in_img = project_count(pts, Rinv, tinv, K, D, W_img, H_img)
    print(f"[inverse] front-facing: {int(front.sum())}  in-image: {n_in}")
    if n_in == 0:
        raise SystemExit(
            "No projected points landed inside the image with any transform."
        )

    idx_inimg = np.where(in_img)[0]
    uv_in = uv[in_img]
    inside_mask = mask.astype(bool)[uv_in[:, 1], uv_in[:, 0]]
    pts_col = pts[idx_inimg[inside_mask]]
    print(f"masked cloud: {len(pts_col)} points")

    dst = from_points(pts_col.astype(np.float32))
    dst = g3.remove_statistical_outlier(dst, nb_neighbors=30, std_ratio=1.0)

    # cloud is in LiDAR frame; move into the camera frame for template search
    dst_cam = dst.transform(jnp.asarray(T_inv, jnp.float32))
    H_est, src_down = estimator.find_best_template_teaser(dst_cam)
    T_m2c = H_est  # already model -> camera (reference composes inv(T) @ H
    # because its search ran in the LiDAR frame, main_seibersdorf.py:199)
    print(T_m2c)

    overlay = draw_model_projection_with_axes(
        img_bgr.copy(), cad_points, K, T_m2c.astype(np.float32)
    )
    if args.save_overlay:
        cv2.imwrite(args.save_overlay, overlay)
    if not args.headless:
        cv2.imshow("Live Tracking", overlay)
        print("Press ESC to close window...")
        while True:
            if cv2.waitKey(30) & 0xFF == 27:
                break
        cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
