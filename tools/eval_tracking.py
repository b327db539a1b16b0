"""Reproducible synthetic-ground-truth streaming tracking evaluation.

Produces the ADD-S accuracy table quoted in BASELINE.md / docs/PERFORMANCE.md
("Accuracy under sustained tracking") from a checked-in script instead of ad
hoc profiling: an asymmetric L-shaped CAD object rotates at a fixed rate, the
full INIT -> TRACK loop runs, and every tracked frame's pose is scored
against the renderer's ground truth with ADD-S.

Modes compare the reference's sparse-sampling ICP operating point
(main_realsense.py:17 TARGET_PTS=100, also 300) against the dense mode
(``target_pts=0``: full 4096-point compacted clouds), quantifying the
random-sampling noise floor that compounds through the per-frame delta.

The ``--detector`` axis selects what feeds the tracker its masks
(reference product path: Detector.py:35 conf=0.7 masks -> masked cloud,
RealSenseClass.py:56-69):

- ``perfect``      — exact rendered silhouette (isolates the
                     registration/tracking stack from detection);
- ``degraded:<px>`` — perfect mask morphologically eroded/dilated by up to
                     ``px`` pixels with boundary jitter, modeling real
                     segmentation-mask error (the dominant real-world error
                     source for masked back-projection); sweep px to get the
                     sensitivity table;
- ``trained``      — the PRODUCT YOLO detector, fine-tuned on synthetic
                     renders of the eval object by the framework's own
                     trainer, running in the fused detect+track program —
                     the full pipeline number.
- ``trained-ckpt`` — like ``trained``, but the trained weights are round-
                     tripped through an fp16 Ultralytics-style ``best.pt``
                     and re-imported via the production checkpoint loader
                     first (the reference's artifact contract,
                     Detector.py:7; VERDICT r3 item 4).

``--icp-variant``/``--icp-kernel`` select the tracking ICP estimator
(p2p reference parity / p2l point-to-plane) and IRLS robust kernel.

Run (TPU or CPU):
    python tools/eval_tracking.py                     # 100 frames, 300 vs 0
    python tools/eval_tracking.py --modes 0 --detector degraded:2
    python tools/eval_tracking.py --modes 0 --detector trained --frames 60
    python tools/eval_tracking.py --cpu --res 128x96 --frames 20   # smoke

Prints a markdown table and one JSON line per mode.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=100, help="tracked frames per mode")
    p.add_argument("--modes", default="300,0",
                   help="comma list of target_pts values (0 = dense ICP)")
    p.add_argument("--rot-per-frame", type=float, default=0.008,
                   help="object rotation per frame, radians")
    p.add_argument("--scale", type=float, default=1.0, help="object scale (m)")
    p.add_argument("--res", default="640x480", help="camera WxH")
    p.add_argument("--icp-dist", type=float, default=0.01,
                   help="tracking ICP correspondence distance (reference: 0.01)")
    p.add_argument("--icp-variant", default="p2p", choices=["p2p", "p2l"],
                   help="tracking ICP estimator (p2p = reference parity)")
    p.add_argument("--icp-kernel", default="none",
                   choices=["none", "huber", "tukey"],
                   help="IRLS robust kernel on tracking-ICP residuals")
    p.add_argument("--motion-model", default="none",
                   choices=["none", "constant_velocity"],
                   help="render-predict pose extrapolation for the tracker")
    p.add_argument("--smooth-alpha", type=float, default=1.0,
                   help="SE(3) alpha-beta OUTPUT pose filter gain (1 = off, "
                   "reference parity); smooths the reported stream only")
    p.add_argument("--smooth-beta", type=float, default=0.3,
                   help="velocity gain of the output pose filter")
    p.add_argument("--detector", default="perfect",
                   help="perfect | degraded:<px> | trained | trained-ckpt "
                        "(see module doc)")
    p.add_argument("--detector-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="YOLO forward dtype for --detector trained (the "
                   "main_realsense --detector-dtype axis: bfloat16 runs the "
                   "conv blocks in the MXU-native format; only the mask is "
                   "affected)")
    p.add_argument("--conf", default="0.7",
                   help="detection confidence for the trained detector "
                   "(reference Detector.py:35). 'auto' calibrates to half "
                   "the trained model's top score on a held-out render — a "
                   "from-scratch short fine-tune ranks correctly long "
                   "before its absolute scores reach 0.7")
    p.add_argument("--train-epochs", type=int, default=120,
                   help="fine-tune epochs for --detector trained (the model\n                   trains from scratch: ~300+ optimizer steps needed)")
    p.add_argument("--train-images", type=int, default=48)
    p.add_argument("--train-lr", type=float, default=0.004)
    p.add_argument("--train-imgsz", type=int, default=0,
                   help="training letterbox size; 0 = camera width rounded "
                   "up to a multiple of 32")
    p.add_argument("--observation", default="splat",
                   choices=["splat", "mesh", "analytic"],
                   help="observation instrument: 'splat' = point-splat "
                        "renders (a DIFFERENT instrument from the raster the "
                        "tracker predicts through, with measured biases — "
                        "shared-error cancellation is broken by default); "
                        "'mesh' = exact triangle rasterization (<1 mm vs "
                        "analytic depth) — separates instrument error from "
                        "estimator error; 'analytic' = closed-form numpy "
                        "ray-cast of the eval L-shape (camera/analytic.py — "
                        "shares NO code with the render stack; closes the "
                        "correlated-error channel a shared convention bug "
                        "would open)")
    p.add_argument("--noise-sigma", type=float, default=0.0,
                   help="synthetic depth noise (m)")
    p.add_argument("--kidnap", type=int, default=0,
                   help="teleport the object (in-plane jump of --kidnap-angle "
                   "rad) after this many rotating frames; the row then "
                   "reports recovery_frames — camera frames from the kidnap "
                   "until tracking is re-acquired within 3%% of the diagonal "
                   "(0 disables). Pair with --reinit-fitness")
    p.add_argument("--kidnap-angle", type=float, default=1.2)
    p.add_argument("--kidnap-shift", type=float, default=0.5,
                   help="approach teleport (m, toward the camera) applied at "
                   "the kidnap frame; a uniform depth offset beyond the ICP "
                   "correspondence gate defeats plain tracking (lateral or "
                   "roll-only jumps leave overlap and self-recover)")
    p.add_argument("--reinit-fitness", type=float, default=0.0,
                   help="Tracker(reinit_fitness=...): sustained-low-fitness "
                   "global re-init (failure detection)")
    p.add_argument("--reinit-patience", type=int, default=8)
    p.add_argument("--occlude", type=float, default=0.0,
                   help="foreground occluder: vertical plate at half object "
                   "distance covering this fraction of the object's "
                   "projected width (0 disables)")
    p.add_argument("--background-depth", type=float, default=0.0,
                   help="flat background wall depth in units of object "
                   "distance (e.g. 1.15 = just behind the object; 0 = empty "
                   "scene). With --detector degraded:<px>, dilated masks "
                   "bleed wall points into the cloud — the outlier "
                   "contamination the robust ICP kernels target")
    p.add_argument("--objects", type=int, default=1,
                   help="number of object instances in the scene; >1 runs "
                   "the MultiTracker (batched vmapped frame program) with "
                   "per-instance perfect masks and reports per-track ADD-S, "
                   "acquisition latency, and identity stability")
    p.add_argument("--mixed-cad", action="store_true",
                   help="with --objects >1: heterogeneous scene — odd "
                   "instances are a DIFFERENT box CAD (class 1), tracked "
                   "against its own model/template DB through the "
                   "multi-CLASS batched frame program; each track is scored "
                   "against its own class's model only")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (for CI / no TPU)")
    p.add_argument("--json-out", default=None, help="also write results here")
    return p


def _run_multi_mode(args, estimator, model_pts, diag, intr, mode, mixed=None):
    """One ``--objects N`` evaluation row: N instances of the CAD rotate in
    the same scene (mutual occlusion via the camera's nearest-depth
    composite), the MultiTracker advances every instance in one batched
    device program, and each track is scored per frame against its
    nearest-ADD-S ground-truth instance.

    Reports accuracy (ADD-S over frames where all N tracks are alive),
    acquisition latency (MultiTracker spawns at most one global init per
    frame — the expensive path), identity stability (``id_switches``: a
    track's nearest-GT instance changed between frames; ``frames_distinct``:
    fraction of scored frames where the N tracks cover N distinct
    instances), and the batched step time.
    """
    import jax.numpy as jnp
    import numpy as np

    from poseestimator_tpu import geom3d as g3
    from poseestimator_tpu.camera import SyntheticCamera
    from poseestimator_tpu.models.yolo.nms import Detections
    from poseestimator_tpu.pipeline.multi_tracking import MultiTracker

    if args.detector != "perfect" and not args.detector.startswith("degraded"):
        raise SystemExit("--objects >1 supports --detector perfect|degraded:<px>")
    n_obj = args.objects
    # heterogeneous scenes (--mixed-cad): odd instances are the second CAD
    # (class 1); tracks register/render their OWN class's model through the
    # multi-class batched frame program, and scoring never crosses classes
    cls_of_inst = [i % 2 if mixed else 0 for i in range(n_obj)]
    models = {0: model_pts}
    if mixed is not None:
        est2, model2 = mixed
        models[1] = model2

    class PerfectMultiMaskDetector:
        """Per-instance ground-truth visible silhouettes (the camera's
        ``object_masks`` stack) -> one detection per visible instance.
        Mutual occlusion is real: a fully hidden instance yields no
        detection that frame and its track accumulates misses.

        ``degrade_px > 0`` adds the single-object eval's segmentation-error
        model independently per instance: random erosion OR dilation up to
        px pixels plus boundary jitter (boundary pixels flipped with
        probability 0.25) each frame."""

        def __init__(self, camera, max_det: int = 8, degrade_px: int = 0,
                     seed: int = 0, classes=None):
            self.camera = camera
            self.max_det = max_det
            self.px = int(degrade_px)
            self.rng = np.random.default_rng(seed)
            self.classes = classes  # per-INSTANCE class ids (mixed scenes)

        def _degrade(self, m):
            import cv2

            m = m.astype(np.uint8)
            if self.px > 0:
                k = 2 * self.rng.integers(1, self.px + 1) + 1
                kernel = np.ones((k, k), np.uint8)
                m = (cv2.erode if self.rng.random() < 0.5 else cv2.dilate)(
                    m, kernel
                )
            ring = cv2.dilate(m, np.ones((3, 3), np.uint8)) - cv2.erode(
                m, np.ones((3, 3), np.uint8)
            )
            flip = (self.rng.random(m.shape) < 0.25) & (ring > 0)
            return np.where(flip, 1 - m, m).astype(bool)

        def __call__(self, img, conf=0.7, iou=0.7):
            ms = np.asarray(self.camera.object_masks)
            if self.px > 0:
                ms = np.stack([self._degrade(m) for m in ms])
            Hm, Wm = ms.shape[1:]
            masks = np.zeros((self.max_det, Hm, Wm), bool)
            boxes = np.zeros((self.max_det, 4), np.float32)
            valid = np.zeros(self.max_det, bool)
            cls = np.zeros(self.max_det, np.int32)
            j = 0
            for i in range(min(ms.shape[0], self.max_det)):
                ys, xs = np.where(ms[i])
                if len(xs) == 0:
                    continue
                masks[j] = ms[i]
                boxes[j] = (xs.min(), ys.min(), xs.max(), ys.max())
                valid[j] = True
                if self.classes is not None:
                    cls[j] = self.classes[i]
                j += 1
            det = Detections(
                boxes=jnp.asarray(boxes),
                scores=jnp.asarray(valid, jnp.float32),
                classes=jnp.asarray(cls),
                coeffs=jnp.zeros((self.max_det, 32)),
                valid=jnp.asarray(valid),
            )
            return det, jnp.asarray(masks), jnp.asarray(boxes)

    F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    # lateral spread in the camera frame + staggered depths (breaks z-buffer
    # ties and keeps outer instances inside the 60-degree frustum) + distinct
    # rotation phases so the instances never share an orientation
    offs = [(i - (n_obj - 1) / 2) * 0.65 * diag for i in range(n_obj)]
    dists = [diag * (2.3 + 0.12 * i) for i in range(n_obj)]
    phases = [0.1 + 1.1 * i for i in range(n_obj)]
    bases = [
        F @ np.asarray(g3.look_at(d * dists[i], [0, 0, 0], [0, 1, 0]))
        for i in range(n_obj)
    ]

    def stack_at(a):
        Ts = []
        for i in range(n_obj):
            P = np.eye(4, dtype=np.float32)
            P[:3, :3] = np.asarray(g3.rot_z(phases[i] + a))
            T = (P @ bases[i]).astype(np.float32)
            T[0, 3] += offs[i]
            Ts.append(T)
        return np.stack(Ts)

    def poses():
        # static acquisition frames: MultiTracker spawns at most one track
        # per frame, so all N instances need N frames (+ slack) to acquire
        for _ in range(n_obj + 2):
            yield stack_at(0.0)
        a = 0.0
        for _ in range(args.frames):
            a += args.rot_per_frame
            yield stack_at(a)

    pts = np.asarray(estimator._cad_pts)
    inst_geoms = None
    if mixed is not None:
        pts2 = np.asarray(est2._cad_pts)
        inst_geoms = [(pts, np.zeros_like(pts)), (pts2, np.zeros_like(pts2))]
    use_mesh = getattr(args, "observation", "splat") == "mesh"
    cam = SyntheticCamera(
        pts, np.zeros_like(pts), poses(), intr,
        noise_sigma=args.noise_sigma,
        filter_depth=args.noise_sigma > 0,
        instance_geoms=inst_geoms,
        mesh=estimator.mesh if use_mesh else None,
        instance_meshes=(
            [estimator.mesh, est2.mesh] if (use_mesh and mixed is not None)
            else None
        ),
    )
    deg_px = 0
    if args.detector.startswith("degraded"):
        deg_px = int(args.detector.split(":", 1)[1]) if ":" in args.detector else 2
    detector = PerfectMultiMaskDetector(cam, max_det=max(8, n_obj),
                                        degrade_px=deg_px,
                                        classes=cls_of_inst)
    tracker = MultiTracker(
        cam, {0: estimator, 1: est2} if mixed is not None else estimator,
        detector, max_objects=n_obj, target_pts=mode,
        icp_dist=args.icp_dist, conf=0.7, iou_match=0.2,
        smooth_alpha=args.smooth_alpha, smooth_beta=args.smooth_beta,
    )

    per_frame = []  # (N,) ADD-S per scored frame
    distinct_frames = 0
    assign: dict[int, int] = {}
    id_switches = 0
    acquired_at = None
    step_ms = []
    fidx = 0
    while True:
        res = tracker.step()
        if res is None:
            break
        fidx += 1
        if "track_batch" in res.timings and len(res.tracks) == n_obj:
            step_ms.append(res.timings["track_batch"] * 1000)
        if len(res.tracks) < n_obj:
            continue
        if acquired_at is None:
            acquired_at = fidx
        gts = np.asarray(cam.current_gt)
        frame_errs = []
        seen = set()
        for tr in res.tracks:
            # score the REPORTED pose (output-filtered when --smooth-alpha<1)
            # against the GT instances OF THE TRACK'S CLASS only, with that
            # class's model (mixed scenes must not cross-score classes)
            cand = [i for i in range(n_obj)
                    if cls_of_inst[i] == tr.class_id]
            errs = [
                float(g3.adds_metric(jnp.asarray(tr.T_out),
                                     jnp.asarray(gts[i]),
                                     models[tr.class_id]))
                for i in cand
            ]
            jbest = cand[int(np.argmin(errs))]
            prev = assign.get(tr.track_id)
            if prev is not None and prev != jbest:
                id_switches += 1
            assign[tr.track_id] = jbest
            seen.add(jbest)
            frame_errs.append(min(errs))
        distinct_frames += len(seen) == n_obj
        per_frame.append(frame_errs)

    if not per_frame:
        print(f"objects={n_obj} mode={mode}: never acquired all instances",
              file=sys.stderr)
        return None
    per_frame = np.asarray(per_frame)  # (F, N)
    adds = per_frame.reshape(-1)
    tail = per_frame[-max(len(per_frame) // 10, 1):].reshape(-1)
    return {
        "mode": "dense" if mode == 0 else f"{mode}pt",
        "target_pts": mode,
        "objects": n_obj,
        "frames_scored": int(len(per_frame)),
        "acquired_at_frame": acquired_at,
        "adds_mean_cm": round(float(adds.mean()) * 100, 2),
        "adds_p95_cm": round(float(np.percentile(adds, 95)) * 100, 2),
        "adds_last10pct_cm": round(float(tail.mean()) * 100, 2),
        "adds_mean_vs_diag_pct": round(float(adds.mean()) / diag * 100, 2),
        "per_object_adds_cm": [
            round(float(v) * 100, 2) for v in per_frame.mean(0)
        ],
        "mixed_cad": bool(mixed is not None),
        "classes_of_instances": cls_of_inst if mixed is not None else None,
        "id_switches": id_switches,
        "frames_distinct": round(distinct_frames / len(per_frame), 4),
        "track_batch_ms_median": round(float(np.median(step_ms)), 2)
        if step_ms else None,
        "icp_dist": args.icp_dist,
        "smooth_alpha": args.smooth_alpha,
        "detector": ("perfect-multi" if deg_px == 0
                     else f"degraded-multi:{deg_px}"),
        "rot_per_frame": args.rot_per_frame,
        "noise_sigma": args.noise_sigma,
    }


def run(args, quiet: bool = False):
    """Run the evaluation; returns the list of per-mode result rows.

    Importable (bench.py reuses it for the accuracy column of the bench
    artifact); ``main`` wraps it for CLI use.
    """
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tests"))
    from helpers import l_shape_mesh, write_mesh

    from poseestimator_tpu import geom3d as g3
    from poseestimator_tpu.camera import SyntheticCamera
    from poseestimator_tpu.camera.analytic import make_lshape_raycaster
    from poseestimator_tpu.models.yolo.nms import Detections
    from poseestimator_tpu.pipeline import PoseEstimator, Tracker

    W, H = (int(v) for v in args.res.split("x"))
    intr = g3.Intrinsics.from_fov(60.0, W, H)

    tmp = tempfile.mkdtemp(prefix="eval_tracking_")
    cad = write_mesh(os.path.join(tmp, "l.ply"), l_shape_mesh(args.scale))

    class PerfectMaskDetector:
        """mask = ground-truth visible object silhouette — isolates tracking
        from detection. Uses the camera's ``object_mask`` (correct amid
        occluders/background clutter), falling back to ``depth > 0``."""

        def __init__(self, camera):
            self.camera = camera

        def __call__(self, img, conf=0.7, iou=0.7):
            om = getattr(self.camera, "object_mask", None)
            mask = jnp.asarray(om) if om is not None else self.camera.depth > 0
            det = Detections(
                boxes=jnp.zeros((1, 4)), scores=jnp.ones(1),
                classes=jnp.zeros(1, jnp.int32), coeffs=jnp.zeros((1, 32)),
                valid=jnp.ones(1, bool),
            )
            return det, mask[None], jnp.zeros((1, 4))

    class DegradedMaskDetector(PerfectMaskDetector):
        """Perfect mask + the error modes of a real segmentation model:
        per-frame random erosion OR dilation up to ``px`` pixels, plus
        boundary jitter (boundary pixels flipped with probability 0.25)."""

        def __init__(self, camera, px: int, seed: int = 0):
            super().__init__(camera)
            self.px = int(px)
            self.rng = np.random.default_rng(seed)

        def __call__(self, img, conf=0.7, iou=0.7):
            import cv2

            det, masks, boxes = super().__call__(img, conf, iou)
            m = np.asarray(masks[0]).astype(np.uint8)
            if self.px > 0:
                k = 2 * self.rng.integers(1, self.px + 1) + 1
                kernel = np.ones((k, k), np.uint8)
                m = (cv2.erode if self.rng.random() < 0.5 else cv2.dilate)(
                    m, kernel
                )
            ring = cv2.dilate(m, np.ones((3, 3), np.uint8)) - cv2.erode(
                m, np.ones((3, 3), np.uint8)
            )
            flip = (self.rng.random(m.shape) < 0.25) & (ring > 0)
            m = np.where(flip, 1 - m, m)
            return det, jnp.asarray(m.astype(bool))[None], boxes

    def train_object_detector(estimator, tmp):
        """Fine-tune the product YOLO detector on synthetic renders of the
        eval object (the framework's own trainer; reference detection/train.py
        workflow) and return a pipeline.Detector on the best checkpoint."""
        import cv2

        from poseestimator_tpu.models.yolo.masks import masks_to_polygons
        from poseestimator_tpu.pipeline.detector import Detector
        from poseestimator_tpu import training as TR
        from poseestimator_tpu.render.points import render_shaded

        root = os.path.join(tmp, "detset")
        rng = np.random.default_rng(0)
        diag = float(np.linalg.norm(estimator.mesh.extent))
        F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        n_train = args.train_images
        # val views double as the auto-conf calibration set (min over views
        # below): enough of them to sample the orbit's hard viewpoints
        n_val = max(n_train // 4, 3)
        # one shared rng: the val views differ from train simply by drawing
        # later from the same stream
        for split, n_imgs in (("train_d", n_train), ("val_d", n_val)):
            os.makedirs(os.path.join(root, split, "images"), exist_ok=True)
            os.makedirs(os.path.join(root, split, "labels"), exist_ok=True)
            for i in range(n_imgs):
                az = rng.uniform(0, 2 * np.pi)
                el = rng.uniform(-0.3, 1.2)
                d = np.array([
                    np.cos(el) * np.cos(az), np.sin(el), np.cos(el) * np.sin(az)
                ])
                dist = diag * rng.uniform(1.6, 2.6)
                T = (F @ np.asarray(
                    g3.look_at(d * dist, [0, 0, 0], [0, 1, 0])
                )).astype(np.float32)
                depth, rgb = render_shaded(
                    estimator._cad_pts, jnp.zeros_like(estimator._cad_pts),
                    estimator._cad_valid, jnp.asarray(T), intr,
                    near=0.01, far=10.0,
                )
                img = np.ascontiguousarray(
                    (np.asarray(rgb)[..., ::-1] * 255).astype(np.uint8)
                )
                mask = np.asarray(depth) > 0
                polys = masks_to_polygons(mask)
                if not polys:
                    continue
                poly = polys[0].astype(np.float32)
                poly[:, 0] /= W
                poly[:, 1] /= H
                cv2.imwrite(os.path.join(root, split, "images", f"{i:04d}.jpg"), img)
                with open(
                    os.path.join(root, split, "labels", f"{i:04d}.txt"), "w"
                ) as f:
                    f.write("0 " + " ".join(f"{v:.5f}" for v in poly.reshape(-1)))
        yml = os.path.join(root, "dataset.yaml")
        with open(yml, "w") as f:
            f.write(
                f"path: {root}\ntrain: train_d\nval: val_d\n"
                "names:\n    0: \"object\"\n"
            )
        imgsz = args.train_imgsz or ((W + 31) // 32 * 32)
        cfg = TR.TrainConfig(
            data=yml, epochs=args.train_epochs, imgsz=imgsz,
            batch=min(8, n_train), lr0=args.train_lr, warmup_epochs=3.0,
            patience=max(args.train_epochs, 10),
            project=os.path.join(tmp, "runs"), name="evalobj",
            workers=2, augment=False, max_instances=4,
        )
        tr = TR.Trainer(cfg)
        state, _ = tr.fit(log=lambda *a: None, tensorboard=False)
        det = Detector(tr.export_variables(state), nc=1, imgsz=imgsz,
                       dtype=args.detector_dtype)
        m = tr.evaluate_map(state)
        # absolute-confidence diagnostic on the held-out renders: guides the
        # --conf choice (a from-scratch model ranks correctly long before
        # its scores reach the reference's 0.7 operating point). Calibrating
        # on the WORST val view (min over renders) rather than one arbitrary
        # view keeps auto-conf below the score of every viewpoint — a single
        # easy view otherwise sets a threshold other views can't clear, and
        # the tracker's 3-consecutive-detection warm-up never fires.
        tops = []
        for val_img in sorted(os.listdir(os.path.join(root, "val_d", "images"))):
            probe, _, _ = det(
                cv2.imread(os.path.join(root, "val_d", "images", val_img)),
                conf=0.001,
            )
            tops.append(float(np.max(np.asarray(probe.scores))))
        top_score = min(tops)
        if not quiet:
            print(f"trained detector: box mAP50 {m['map50']:.3f}, top conf "
                  f"{top_score:.3f} (min over {len(tops)} val views; "
                  f"{n_train} synthetic renders, "
                  f"{args.train_epochs} epochs, imgsz {imgsz})")
        return det, m["map50"], top_score

    def ckpt_roundtrip_detector(det, tmp):
        """Export det's variables to the torch twin, save the Ultralytics
        artifact shape (fp16 module under ``{"model": ...}``), re-import
        through ``Detector``'s production checkpoint loader. Every weight
        this detector runs passed through fp16 pickle bytes."""
        import torch

        from poseestimator_tpu.models.yolo.torch_ref import YOLO11SegTorch
        from poseestimator_tpu.models.yolo.weights import variables_to_state_dict
        from poseestimator_tpu.pipeline.detector import Detector

        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in variables_to_state_dict(det.variables).items()}
        tm = YOLO11SegTorch(nc=1, scale="n")
        missing = tm.load_state_dict(sd, strict=False)
        assert not missing.unexpected_keys, missing.unexpected_keys
        # only BN bookkeeping and the constant DFL kernel may be absent
        bad = [k for k in missing.missing_keys
               if not (k.endswith("num_batches_tracked") or ".dfl." in k)]
        assert not bad, bad
        path = os.path.join(tmp, "best_roundtrip.pt")
        torch.save(
            {"model": tm.half(), "epoch": 0,
             "train_args": {"imgsz": det.imgsz}}, path,
        )
        return Detector(path, nc=1, imgsz=det.imgsz,
                        dtype=args.detector_dtype)

    trained_detector = None
    trained_map50 = None
    eff_conf = None if args.conf == "auto" else float(args.conf)

    def make_detector(camera, estimator, tmp):
        nonlocal trained_detector, trained_map50, eff_conf
        spec = args.detector
        if spec == "perfect":
            return PerfectMaskDetector(camera)
        if spec.startswith("degraded"):
            px = int(spec.split(":", 1)[1]) if ":" in spec else 2
            return DegradedMaskDetector(camera, px)
        if spec in ("trained", "trained-ckpt"):
            if trained_detector is None:  # train once, reuse across modes
                trained_detector, trained_map50, top = train_object_detector(
                    estimator, tmp
                )
                if spec == "trained-ckpt":
                    # VERDICT r3 missing-1: the reference consumes a
                    # FINE-TUNED Ultralytics ``best.pt`` (Detector.py:7).
                    # Round-trip the genuinely trained weights (real BN
                    # stats) through an fp16 Ultralytics-style checkpoint
                    # and re-import via the production path, so this row's
                    # detector went through the same artifact contract.
                    trained_detector = ckpt_roundtrip_detector(
                        trained_detector, tmp
                    )
                if eff_conf is None:
                    # half the weakest val view's top score: every view then
                    # clears the threshold 2x. The floor must stay BELOW any
                    # plausible top score — a floor above `top` would gate
                    # out every detection the model can produce.
                    eff_conf = float(np.clip(0.5 * top, 0.005, 0.7))
                    if not quiet:
                        print(f"auto conf -> {eff_conf:.3f}")
                elif top < eff_conf and not quiet:
                    print(f"WARNING: --conf {eff_conf} exceeds the trained "
                          f"model's top score {top:.3f}; detection will "
                          "never fire (use --conf auto)")
            return trained_detector
        raise ValueError(f"unknown --detector {spec!r}")

    def make_camera(estimator, n_frames):
        diag = float(np.linalg.norm(estimator.mesh.extent))
        d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
        F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        base = F @ np.asarray(g3.look_at(d * diag * 2.0, [0, 0, 0], [0, 1, 0]))

        def poses():
            a = 0.1
            # warm-up frames are static (detector warm-up), then rotate
            for _ in range(12):
                P = np.eye(4, dtype=np.float32)
                P[:3, :3] = np.asarray(g3.rot_z(a))
                yield (P @ base).astype(np.float32)
            shift = 0.0
            for i in range(n_frames):
                a += args.rot_per_frame
                if args.kidnap and i == args.kidnap:
                    # teleport (kidnapped object): in-plane roll + approach
                    # shift toward the camera. The shift matters — a pure
                    # roll of this object stays inside the dense-ICP basin
                    # and plain tracking re-converges in ~3 frames
                    # (measured), as does a lateral jump (the elongated
                    # shape leaves partial overlap for ICP to ride). A
                    # uniform depth offset beyond the correspondence gate
                    # kills EVERY correspondence at once, so ICP fitness
                    # pins near 0 while detection keeps succeeding — the
                    # in-frame divergence the reference FSM (re-init on
                    # detection misses only, main_realsense.py:100) can
                    # never recover from.
                    a += args.kidnap_angle
                    shift = args.kidnap_shift
                P = np.eye(4, dtype=np.float32)
                P[:3, :3] = np.asarray(g3.rot_z(a))
                T = (P @ base).astype(np.float32)
                T[2, 3] -= shift
                yield T

        pts = np.asarray(estimator._cad_pts)
        dist = diag * 2.0
        occluder = None
        if args.occlude > 0:
            # projected object width at its distance; plate at half distance,
            # centered on the optical axis (the object orbits the center)
            w_px = intr.fx * diag / dist
            half = 0.5 * args.occlude * w_px
            occluder = (
                max(0, int(intr.cx - half)),
                min(intr.width, int(intr.cx + half)),
                0.5 * dist,
            )
        return SyntheticCamera(
            pts, np.zeros_like(pts), poses(), intr,
            noise_sigma=args.noise_sigma,
            background_depth=args.background_depth * dist,
            occluder=occluder,
            # noisy streams get the RealSense post-processing chain, like
            # the real camera path (clean streams stay raw for determinism)
            filter_depth=args.noise_sigma > 0,
            # --observation mesh: the exact triangle-raster instrument (the
            # default splat is already a different instrument from the
            # raster the tracker predicts through; see --observation help);
            # --observation analytic: closed-form numpy ray-cast, zero
            # shared code with the render stack
            mesh=estimator.mesh if args.observation == "mesh" else None,
            depth_fn=(make_lshape_raycaster(intr, args.scale)
                      if args.observation == "analytic" else None),
        )

    results = []
    estimator = None
    for mode in [int(m) for m in args.modes.split(",")]:
        # fresh estimator per mode (deterministic PRNG stream per run)
        estimator = PoseEstimator(
            cad, os.path.join(tmp, "views"), intr, target_points=mode or 100,
            seed=0,
        )
        model_pts = g3.from_points(
            estimator.mesh.sample_points_uniformly(
                512, np.random.default_rng(0)
            )[0]
        )
        diag = float(np.linalg.norm(estimator.mesh.extent))
        if args.objects > 1:
            mixed = None
            if args.mixed_cad:
                from helpers import box_mesh

                cad2 = write_mesh(
                    os.path.join(tmp, "b.ply"),
                    box_mesh(0.5 * args.scale, 0.3 * args.scale,
                             0.2 * args.scale),
                )
                est2 = PoseEstimator(
                    cad2, os.path.join(tmp, "views_b"), intr,
                    target_points=mode or 100, seed=1,
                )
                model2 = g3.from_points(
                    est2.mesh.sample_points_uniformly(
                        512, np.random.default_rng(1)
                    )[0]
                )
                mixed = (est2, model2)
            row = _run_multi_mode(args, estimator, model_pts, diag, intr,
                                  mode, mixed=mixed)
            if row is not None:
                results.append(row)
                if not quiet:
                    print(json.dumps(row))
            continue
        cam = make_camera(estimator, args.frames)
        detector = make_detector(cam, estimator, tmp)  # may resolve auto conf
        tracker = Tracker(
            cam, estimator, detector, target_pts=mode,
            icp_dist=args.icp_dist, icp_variant=args.icp_variant,
            icp_kernel=args.icp_kernel, motion_model=args.motion_model,
            smooth_alpha=args.smooth_alpha, smooth_beta=args.smooth_beta,
            reinit_fitness=args.reinit_fitness,
            reinit_patience=args.reinit_patience,
            conf=0.7 if eff_conf is None else eff_conf, class_id=0,
            warmup_frames=3, max_init_frames=20,
        )
        adds, mssds, mspds, vsds = [], [], [], []
        jit_t, jit_r = [], []  # motion-compensated frame-to-frame jitter
        sig_t, sig_r = [], []  # per-frame predicted pose sigmas (ICP GN cov)
        prev_eg = None
        K33 = jnp.asarray(intr.K, jnp.float32)
        from poseestimator_tpu.render import vsd_multi_tau
        from poseestimator_tpu.utils.bop import BOP_FRACS, bop_average_recall

        # BOP19 tau sweep (5%..50% of diameter); one render pair per frame
        # covers the whole sweep. Column 1 (tau = 10% of diameter) is the
        # single-number vsd_mean reported since round 3.
        vsd_taus = jnp.asarray(BOP_FRACS * diag, jnp.float32)
        # camera-frame index of the kidnap (12 warmup + args.kidnap rotating
        # frames + 1 since frames_served counts frames already delivered)
        kidnap_frame = (12 + args.kidnap + 1) if args.kidnap else None
        recovery_frames = None
        while True:
            res = tracker.step()
            if res is None:
                break
            if res.state == "track" and res.detected and res.T_m2c is not None:
                T_e = jnp.asarray(res.T_m2c)
                T_g = jnp.asarray(cam.current_gt)
                adds.append(float(g3.adds_metric(T_e, T_g, model_pts)))
                mssds.append(float(g3.mssd_metric(T_e, T_g, model_pts)))
                mspds.append(float(g3.mspd_metric(T_e, T_g, K33, model_pts)))
                vsds.append(np.asarray(vsd_multi_tau(
                    T_e, T_g, estimator._cad_pts, estimator._cad_valid,
                    intr, vsd_taus,
                )))
                if (kidnap_frame is not None and recovery_frames is None
                        and cam.frames_served >= kidnap_frame
                        and adds[-1] < 0.03 * diag):
                    recovery_frames = cam.frames_served - kidnap_frame
                # motion-compensated output jitter: the reported pose's
                # frame-to-frame delta minus the ground truth's — what a
                # downstream consumer (grasp planner, renderer) experiences
                # as pose flicker. Consecutive tracked frames only.
                Te_np = np.asarray(res.T_m2c, np.float64)
                Tg_np = np.asarray(cam.current_gt, np.float64)
                if prev_eg is not None and cam.frames_served == prev_eg[2] + 1:
                    De = Te_np @ np.linalg.inv(prev_eg[0])
                    Dg = Tg_np @ np.linalg.inv(prev_eg[1])
                    E = De @ np.linalg.inv(Dg)
                    jit_t.append(float(np.linalg.norm(E[:3, 3])))
                    cosr = np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)
                    jit_r.append(float(np.arccos(cosr)))
                prev_eg = (Te_np, Tg_np, cam.frames_served)
                if res.pose_cov is not None:
                    sig_t.append(res.sigma_t_mm)
                    sig_r.append(res.sigma_rot_deg)
        adds = np.asarray(adds)
        if len(adds) == 0:
            print(f"mode target_pts={mode}: tracking never started", file=sys.stderr)
            continue
        head = adds[: max(len(adds) // 10, 1)]
        tail = adds[-max(len(adds) // 10, 1):]
        row = {
            "mode": "dense" if mode == 0 else f"{mode}pt",
            "target_pts": mode,
            # self-describing frame accounting (VERDICT r4 item 8): the
            # camera serves 12 static warm-up frames THEN --frames motion
            # frames; every frame the FSM tracks after init is scored, so
            # frames_tracked can exceed motion_frames (leftover warm-up
            # frames track too) or fall short (acquisition + misses)
            "motion_frames": int(args.frames),
            "camera_frames": int(12 + args.frames),
            "frames_tracked": int(len(adds)),
            "adds_mean_cm": round(float(adds.mean()) * 100, 2),
            "adds_p95_cm": round(float(np.percentile(adds, 95)) * 100, 2),
            "adds_first10pct_cm": round(float(head.mean()) * 100, 2),
            "adds_last10pct_cm": round(float(tail.mean()) * 100, 2),
            "adds_mean_vs_diag_pct": round(float(adds.mean()) / diag * 100, 2),
            # BOP-challenge metric family (identity symmetry set): worst-case
            # surface error (m -> cm) and worst-case reprojection error (px)
            "mssd_mean_cm": round(float(np.mean(mssds)) * 100, 2),
            "mssd_p95_cm": round(float(np.percentile(mssds, 95)) * 100, 2),
            "mspd_mean_px": round(float(np.mean(mspds)), 2),
            "mspd_p95_px": round(float(np.percentile(mspds, 95)), 2),
            "vsd_mean": round(float(np.mean(np.asarray(vsds)[:, 1])), 4),
            "vsd_recall_03": round(float(np.mean(np.asarray(vsds)[:, 1] < 0.3)), 4),
            # BOP19 Average Recall (the challenge headline score): mean
            # recall over the 5%..50% threshold sweeps of all three metrics
            **bop_average_recall(
                np.asarray(vsds), np.asarray(mssds), np.asarray(mspds),
                diameter=diag, image_width=intr.width,
            ),
            "icp_dist": args.icp_dist,
            "icp_variant": args.icp_variant,
            "icp_kernel": args.icp_kernel,
            "motion_model": args.motion_model,
            "smooth_alpha": args.smooth_alpha,
            # output-stream stability: mean motion-compensated pose delta
            # (mm / mrad per frame) — the flicker a downstream consumer sees
            "jitter_t_mm": round(float(np.mean(jit_t)) * 1000, 3)
            if jit_t else None,
            "jitter_r_mrad": round(float(np.mean(jit_r)) * 1000, 3)
            if jit_r else None,
            # predicted per-frame pose uncertainty (mean of the tracker's
            # reported Gauss-Newton sigmas, FrameResult.sigma_*) and its
            # calibration against the MEASURED motion-compensated jitter:
            # consecutive-frame innovation ~ difference of two independent
            # per-frame errors, so rms(jitter) ~= sqrt(2) * rms(sigma) for a
            # calibrated covariance; ratio > 1 = the covariance (which
            # conditions on the final data association) underestimates.
            "sigma_t_mean_mm": round(float(np.mean(sig_t)), 3)
            if sig_t else None,
            "sigma_r_mean_deg": round(float(np.mean(sig_r)), 4)
            if sig_r else None,
            "cov_calib_jitter_ratio": round(
                float(np.sqrt(np.mean(np.square(jit_t))) * 1000.0
                      / max(np.sqrt(2.0 * np.mean(np.square(sig_t))), 1e-9)), 2)
            if jit_t and sig_t else None,
            "detector": args.detector,
            "conf": None if eff_conf is None else round(eff_conf, 4),
            "rot_per_frame": args.rot_per_frame,
            "occlude": args.occlude,
            "background_depth": args.background_depth,
        }
        if args.kidnap:
            row["kidnap_frame"] = kidnap_frame
            row["kidnap_shift"] = args.kidnap_shift
            row["reinit_fitness"] = args.reinit_fitness
            # None = never re-acquired within the run
            row["recovery_frames"] = recovery_frames
        if trained_map50 is not None:
            row["detector_map50"] = round(trained_map50, 4)
        results.append(row)
        if not quiet:
            print(json.dumps(row))

    if results and not quiet:
        if args.objects > 1:
            print("\n| ICP mode | objects | ADD-S mean | p95 | acquired@ | id switches |")
            print("|---|---|---|---|---|---|")
            for r in results:
                print(
                    f"| {r['mode']} | {r['objects']} | {r['adds_mean_cm']} cm "
                    f"({r['adds_mean_vs_diag_pct']}% diag) | {r['adds_p95_cm']} cm "
                    f"| frame {r['acquired_at_frame']} | {r['id_switches']} |"
                )
        else:
            print("\n| ICP mode | ADD-S mean | p95 | first 10% -> last 10% |")
            print("|---|---|---|---|")
            for r in results:
                print(
                    f"| {r['mode']} | {r['adds_mean_cm']} cm "
                    f"({r['adds_mean_vs_diag_pct']}% diag) | {r['adds_p95_cm']} cm "
                    f"| {r['adds_first10pct_cm']} -> {r['adds_last10pct_cm']} cm |"
                )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    return results


def main(argv=None):
    return 0 if run(build_parser().parse_args(argv)) else 1


if __name__ == "__main__":
    sys.exit(main())
