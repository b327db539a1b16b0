"""BOP scene-directory evaluation: the challenge workflow over ALL frames.

The offline app (apps/main_image.py, reference main_image.py parity) scores
one frame; the BOP challenge scores a whole scene and reports the Average
Recall of the VSD/MSSD/MSPD threshold sweeps (Hodan et al. ECCV 2020). This
tool sweeps every frame listed in ``scene_gt.json``: mask -> masked cloud
(utils/bop.get_pointcloud, reference registration_utils.py:26-95) -> offline
template registration (pipeline/offline.py) -> BOP metric family vs GT
(utils/bop.frame_metrics) -> per-scene ``bop_average_recall``.

Scene layout: both the canonical BOP tree (``rgb/NNNNNN.jpg``,
``depth/NNNNNN.png``, ``mask_visib/NNNNNN_000000.png``) and the flat
single-directory form (``NNNNNN.{jpg,png}``) are accepted; frames come from
the scene_gt keys.

Mask sources (--mask):
  visib     ground-truth visible mask (mask_visib/, BOP's own annotation)
  depthpos  depth > 0 (single-object synthetic scenes)
  detector  the product YOLO detector (--weights, reference Detector.py:35)

Run:
    python tools/eval_bop.py --scene-dir scenes/000001 --ply obj.ply \
        --templates views/ --mask visib [--cpu] [--json-out out.json]

Prints one JSON line per frame and a summary line with the scene AR.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene-dir", required=True, help="BOP scene directory")
    p.add_argument("--ply", required=True, help="CAD model (.ply)")
    p.add_argument("--templates", required=True, help="template views dir")
    p.add_argument("--mask", default="visib",
                   choices=["visib", "depthpos", "detector"])
    p.add_argument("--weights", default=None,
                   help=".pt weights for --mask detector")
    p.add_argument("--nc", type=int, default=5)
    p.add_argument("--class-id", type=int, default=0)
    p.add_argument("--obj-index", type=int, default=0,
                   help="GT instance index within each frame")
    p.add_argument("--target-points", type=int, default=400)  # main_image.py:68
    p.add_argument("--registration", default="offline",
                   choices=["offline", "product"],
                   help="'offline' = the reference main_image parity path "
                        "(FPS + fixed-radius FPFH + TEASER + ICP, "
                        "pipeline/offline.py); 'product' = the realtime "
                        "init search (5 hypotheses/template, coarse ICP, "
                        "render-ICP polish, depth+silhouette scoring via "
                        "the exact raster) — markedly stronger on hard "
                        "single-frame poses")
    p.add_argument("--max-frames", type=int, default=0, help="0 = all")
    p.add_argument("--view-set", default="reduced", choices=["reduced", "full"],
                   help="--registration product template coverage: 'reduced' "
                        "= the reference's 5-view upper-arc ring; 'full' = "
                        "the 26-view sphere (templates render on first use "
                        "into --templates) — required when scene poses leave "
                        "the upper arc")
    p.add_argument("--score-res", type=int, default=2, choices=[2, 1],
                   help="product-search scoring-view downscale (2 = half "
                        "res, tracking parity; 1 = full-res silhouette/depth "
                        "scoring)")
    p.add_argument("--polish", type=int, default=1,
                   help="product-search per-template polish width (how many "
                        "coarse hypotheses get the render-ICP polish)")
    p.add_argument("--ambig-margin", type=float, default=0.02,
                   help="frames whose best-vs-next DISTINCT-basin score gap "
                        "is below this are counted ambiguous in the summary")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json-out", default=None)
    p.add_argument("--models-info", default=None,
                   help="BOP models_info.json for symmetry-aware MSSD/MSPD "
                        "(default: auto-detect next to --ply)")
    return p


def _find(scene, sub, stem, exts):
    """Resolve a frame file in canonical (sub/stem.ext) or flat layout."""
    for base in (os.path.join(scene, sub), scene):
        for ext in exts:
            c = os.path.join(base, stem + ext)
            if os.path.exists(c):
                return c
    return None


def run(args, quiet: bool = False):
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, root)

    from poseestimator_tpu import geom3d as g3
    from poseestimator_tpu.geom3d.cloud import from_points
    from poseestimator_tpu.pipeline.offline import find_best_template_teaser
    from poseestimator_tpu.utils import bop
    from poseestimator_tpu.utils.plyio import read_ply

    scene = args.scene_dir
    gt_path = os.path.join(scene, "scene_gt.json")
    cam_path = os.path.join(scene, "scene_camera.json")
    with open(gt_path) as f:
        frame_keys = sorted(json.load(f).keys(), key=int)
    if args.max_frames:
        frame_keys = frame_keys[: args.max_frames]

    src_clouds = [
        from_points(read_ply(f).vertices)
        for f in sorted(glob.glob(os.path.join(args.templates, "*.ply")))
    ]
    if not src_clouds and args.registration == "offline":
        # the product path auto-renders its template DB on first use
        raise SystemExit(f"no template .ply files in {args.templates}")

    verts = np.asarray(read_ply(args.ply).vertices, np.float32)
    if float(np.max(verts.max(0) - verts.min(0))) < 1.0:
        verts = verts * 1000.0  # meter-scale CAD -> BOP mm convention

    # symmetry-aware MSSD/MSPD (BOP protocol): per-object symmetry set from
    # models_info.json, keyed by each frame's GT obj_id
    mi_path = args.models_info or os.path.join(
        os.path.dirname(os.path.abspath(args.ply)), "models_info.json")
    sym_cache: dict = {}

    def _syms_for(obj_id):
        if obj_id not in sym_cache:
            sym_cache[obj_id] = (
                bop.load_object_symmetries(mi_path, obj_id)
                if os.path.exists(mi_path) else None
            )
        return sym_cache[obj_id]

    detector_mask = None
    if args.mask == "detector":
        if not args.weights:
            raise SystemExit("--mask detector needs --weights")
        from poseestimator_tpu.pipeline.detector import detect_mask

        detector_mask = lambda rgb_path: detect_mask(
            args.weights, rgb_path, class_id=args.class_id, nc=args.nc
        )

    rows, vsds, mssds, mspds = [], [], [], []
    diam_mm = None
    for k in frame_keys:
        stem = f"{int(k):06d}"
        depth_path = _find(scene, "depth", stem, (".png",))
        rgb_path = _find(scene, "rgb", stem, (".jpg", ".png"))
        if depth_path is None:
            print(f"frame {k}: no depth image", file=sys.stderr)
            continue

        if args.mask == "visib":
            mp = _find(scene, "mask_visib", f"{stem}_{args.obj_index:06d}",
                       (".png",)) or _find(scene, "mask_visib", stem, (".png",))
            if mp is None:
                print(f"frame {k}: no mask_visib", file=sys.stderr)
                continue
            mask = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        elif args.mask == "depthpos":
            d = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
            mask = ((d > 0) * 255).astype(np.uint8)
        else:
            mask = detector_mask(rgb_path)

        cloud, K = bop.get_pointcloud(
            depth_path, rgb_path, cam_path, mask, frame_id=int(k)
        )
        if cloud is None or int(cloud.count()) == 0:
            print(f"frame {k}: empty masked cloud", file=sys.stderr)
            continue

        if args.registration == "product":
            # the realtime init search; intr comes from the frame's K
            d0 = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
            h0, w0 = d0.shape[:2]
            intr0 = g3.Intrinsics(
                fx=float(K[0, 0]), fy=float(K[1, 1]),
                cx=float(K[0, 2]), cy=float(K[1, 2]), width=w0, height=h0,
            )
            # cache key covers EVERY input that shapes the estimator (advisor
            # r4 medium: an intrinsics-only key silently reused the previous
            # CAD/template DB across in-process A/B sweeps over --ply /
            # --templates / --view-set — exactly this tool's use case)
            est_key = (os.path.abspath(args.ply),
                       os.path.abspath(args.templates), args.view_set, intr0,
                       args.score_res, args.polish)
            nonlocal_est = getattr(run, "_product_est", None)
            if nonlocal_est is None or getattr(run, "_product_key", None) != est_key:
                from poseestimator_tpu.pipeline.pose_estimator import (
                    PoseEstimator,
                )

                nonlocal_est = PoseEstimator(args.ply, args.templates, intr0,
                                             view_set=args.view_set,
                                             search_score_res=args.score_res,
                                             search_polish=args.polish)
                run._product_est = nonlocal_est
                run._product_key = est_key
            H, _src, cands = nonlocal_est.find_best_template_candidates(
                cloud, mask=(mask > 0)
            )
            score = -1.0  # the product search reports no chamfer score
            # ambiguity margin: best-vs-next score gap among DISTINCT basins
            # (candidates within 10 deg + 5% diag of the winner are the same
            # basin polished from another template)
            margin = None
            if len(cands) > 1:
                Tw = np.asarray(cands[0][1])
                diam = float(np.linalg.norm(np.ptp(verts, axis=0))) / 1000.0
                for s_c, T_c, _ in cands[1:]:
                    Tc = np.asarray(T_c)
                    R = Tc[:3, :3] @ Tw[:3, :3].T
                    ang = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
                    if (ang > 0.17
                            or np.linalg.norm(Tc[:3, 3] - Tw[:3, 3])
                            > 0.05 * diam):
                        margin = float(s_c - cands[0][0])
                        break
        else:
            _, H, score, _ = find_best_template_teaser(
                cloud, src_clouds, target_points=args.target_points
            )
            margin = None
        T_est = np.asarray(H, np.float64).copy()
        T_est[:3, 3] *= 1000.0  # m -> mm (main_image.py:89)
        T_gt, gt_obj_id = bop.load_scene_gt(gt_path, frame_key=k,
                                            obj_index=args.obj_index)

        depth_raw = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        h_img, w_img = depth_raw.shape[:2]
        intr = g3.Intrinsics(
            fx=float(K[0, 0]), fy=float(K[1, 1]),
            cx=float(K[0, 2]), cy=float(K[1, 2]), width=w_img, height=h_img,
        )
        _, depth_scale, _ = bop.load_camera_intrinsics(
            cam_path, int(k), w_img, h_img
        )
        fm = bop.frame_metrics(
            T_est, T_gt, K, verts, intr,
            scene_depth_mm=depth_raw.astype(np.float32) * depth_scale,
            symmetries_mm=_syms_for(gt_obj_id),
        )
        diam_mm = fm["diameter_mm"]
        vsds.append(fm["vsd"])
        mssds.append(fm["mssd_mm"])
        mspds.append(fm["mspd_px"])
        row = {
            "frame": int(k),
            "adds_mm": round(fm["adds_mm"], 3),
            "mssd_mm": round(fm["mssd_mm"], 3),
            "mspd_px": round(fm["mspd_px"], 2),
            "vsd_tau10": round(float(fm["vsd"][1]), 4),
            "chamfer_score": round(float(score), 6),
        }
        if margin is not None:
            row["init_margin"] = round(margin, 4)
            row["ambiguous"] = bool(margin < args.ambig_margin)
        rows.append(row)
        if not quiet:
            print(json.dumps(row))

    if not rows:
        print("no frames evaluated", file=sys.stderr)
        return None
    ar = bop.bop_average_recall(
        np.stack(vsds), np.asarray(mssds), np.asarray(mspds),
        diameter=diam_mm, image_width=w_img,
    )
    summary = {
        "scene": scene,
        "frames": len(rows),
        "mask": args.mask,
        "adds_mean_mm": round(float(np.mean([r["adds_mm"] for r in rows])), 3),
        "mssd_mean_mm": round(float(np.mean(mssds)), 3),
        "mspd_mean_px": round(float(np.mean(mspds)), 2),
        **ar,
    }
    n_amb = sum(1 for r in rows if r.get("ambiguous"))
    if any("init_margin" in r for r in rows):
        summary["ambiguous_frames"] = n_amb
    if not quiet:
        print(json.dumps(summary))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"frames": rows, "summary": summary}, f, indent=2)
    return summary


def main(argv=None):
    return 0 if run(build_parser().parse_args(argv)) else 1


if __name__ == "__main__":
    sys.exit(main())
