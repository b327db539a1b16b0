"""Multi-object tracking: per-instance 6D poses at camera rate.

The reference tracks only ``detections[0]`` (main_realsense.py:63,101);
BASELINE.json's streaming config calls for multi-object sustained tracking.
Here every tracked instance advances in ONE batched device program — the
fused render/backproject/ICP frame step vmapped over the object axis, so
tracking 8 objects costs barely more than one (the TPU way to scale the
object axis).

Association: greedy IoU between detection boxes and the projected bounding
box of each track's CAD model under its current pose. Unmatched detections
spawn at most one global-registration initialization per frame (template
search is the expensive path); unmatched tracks accumulate misses and die
after ``max_misses``.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom3d as g3
from .pose_estimator import PoseEstimator
from .tracking import PoseFilter, _track_step
from .window import merge_windows, window_for_object


@dataclass
class TrackedObject:
    track_id: int
    class_id: int
    T_m2c: np.ndarray
    misses: int = 0
    age: int = 0
    icp_fitness: float = 0.0
    # reported (output-filtered) pose; == T_m2c when smoothing is off. The
    # internal state (association boxes, render prediction) always uses the
    # raw T_m2c so the filter cannot destabilize tracking.
    T_out: np.ndarray = None
    filter: object = None
    # (6, 6) camera-frame twist covariance of the last tracked update
    # (registration.icp._gn_covariance); None before the first update
    pose_cov: np.ndarray = None
    # init-refinement radius ladder (2 -> 1 -> 0), mirroring the single
    # Tracker's post-init taper: the global search lands voxel-scale off,
    # so a fresh track's first updates run at the reference INIT radii
    # (0.05 then 0.02, main_realsense.py:112-115) before the track radius
    post_init: int = 2
    # static window bucket for THIS track (window_for_object at spawn from
    # its class's CAD diameter and distance); the batch runs the merge
    win: object = "auto"


@dataclass
class MultiFrameResult:
    color: np.ndarray
    tracks: list[TrackedObject]
    n_detections: int
    timings: dict = field(default_factory=dict)


# icp_dist maps per-track (axis 0): fresh tracks run the init-refinement
# radii while mature tracks run the tracking radius, in ONE batched program.
# The batched step runs the RELAXED accel-ICP profile (pose-tol 1e-4 vs the
# single-object 5e-5): the vmapped while_loop runs to its slowest member, so
# B tracks pay B x the worst chain — the relaxed raw-step exit keeps B=8
# under one camera period (bench multi_track_b8_ms) at the multi-object
# operating point's accuracy (tests/test_multi_tracking.py budgets).
# ``win_hw``: one static window bucket shared by the whole batch (the
# merge of the per-track buckets — window.merge_windows).


def _batched_track(mesh_v, mesh_f, masks, depth, Ts, intr, target_pts, keys,
                   icp_dists, win_hw="auto"):
    step = jax.vmap(
        partial(_track_step, icp_pose_tol=1e-4, win_hw=win_hw),
        in_axes=(None, None, 0, None, 0, None, None, 0, 0),
    )
    return step(
        mesh_v, mesh_f, masks, depth, Ts, intr, target_pts, keys, icp_dists
    )


@partial(jax.jit, static_argnames=("intr", "target_pts", "win_hw"))
def _batched_track_multi(mesh_v_stack, mesh_f_stack, cls_idx, masks, depth,
                         Ts, intr, target_pts, keys, icp_dists,
                         win_hw="auto"):
    """Heterogeneous-CLASS batched frame step: each track renders and
    registers ITS class's CAD. The per-class raster meshes live stacked on
    device ((C, V, 3) vertices + (C, F, 3) faces, padded to common
    capacities); each frame gathers the matched tracks' rows ON DEVICE (a
    host gather would ship B x V x 3 across the interconnect every frame)
    and vmaps the same fused track step over the track axis — mixed classes
    still cost ONE dispatch."""
    v_b = mesh_v_stack[cls_idx]
    f_b = mesh_f_stack[cls_idx]
    return jax.vmap(
        partial(_track_step, icp_pose_tol=1e-4, win_hw=win_hw),
        in_axes=(0, 0, 0, None, 0, None, None, 0, 0)
    )(v_b, f_b, masks, depth, Ts, intr, target_pts, keys, icp_dists)


class MultiTracker:
    def __init__(
        self,
        camera,
        estimator: PoseEstimator,
        detector,
        max_objects: int = 8,
        target_pts: int = 100,
        conf: float = 0.7,
        max_misses: int = 5,
        icp_dist: float = 0.01,
        iou_match: float = 0.2,
        smooth_alpha: float = 1.0,
        smooth_beta: float = 0.3,
        seed: int = 0,
        metrics=None,
    ):
        self.camera = camera
        # ``estimator``: one PoseEstimator (single-CAD mode — every detected
        # class registers against the same model, the configuration the
        # reference could at most express) or a {class_id: PoseEstimator}
        # dict for heterogeneous scenes: each track renders/registers ITS
        # class's CAD, all classes advancing in one batched device program
        # (_batched_track_multi).
        if isinstance(estimator, dict):
            self.estimators = {int(c): e for c, e in estimator.items()}
            if not self.estimators:
                raise ValueError("empty estimator dict")
            self.estimator = next(iter(self.estimators.values()))
            for e in self.estimators.values():
                if e.intr != self.estimator.intr:
                    raise ValueError(
                        "all per-class estimators must share the camera "
                        "intrinsics (one physical camera)"
                    )
        else:
            self.estimators = None
            self.estimator = estimator
        self.detector = detector
        self.max_objects = max_objects
        self.target_pts = target_pts
        self.conf = conf
        self.max_misses = max_misses
        self.icp_dist = icp_dist
        self.iou_match = iou_match
        # per-track SE(3) alpha-beta output filters (tracking.PoseFilter);
        # smooth_alpha=1 disables
        self.smooth_alpha = smooth_alpha
        self.smooth_beta = smooth_beta
        self.metrics = metrics
        self._key = jax.random.PRNGKey(seed)
        self._next_id = 0
        self.tracks: list[TrackedObject] = []

        # model-frame bounding box corners for track box prediction
        def _mesh_corners(est):
            lo, hi = est.mesh.min_bound, est.mesh.max_bound
            return np.array(
                [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
                 for z in (lo[2], hi[2])], np.float32,
            )

        if self.estimators is None:
            self._corners = _mesh_corners(self.estimator)
        else:
            self._corners_by_cls = {
                c: _mesh_corners(e) for c, e in self.estimators.items()
            }
            # per-class raster meshes, padded to common vertex/face
            # capacities and stacked on device once; the frame step gathers
            # rows by class. Vertex padding repeats the LAST vertex
            # (np.pad mode="edge"); face padding is degenerate (0,0,0)
            # triples, which reference real vertex 0 and cover no pixel.
            rows = sorted(self.estimators)
            self._cls_row = {c: i for i, c in enumerate(rows)}
            v_max = max(self.estimators[c]._mesh_v.shape[0] for c in rows)
            f_max = max(self.estimators[c]._mesh_f.shape[0] for c in rows)
            vstack, fstack = [], []
            for c in rows:
                e = self.estimators[c]
                v = np.asarray(e._mesh_v)
                f = np.asarray(e._mesh_f)
                vstack.append(np.pad(v, ((0, v_max - len(v)), (0, 0)),
                                     mode="edge"))
                fstack.append(np.pad(f, ((0, f_max - len(f)), (0, 0))))
            self._mesh_v_stack = jnp.asarray(np.stack(vstack))
            self._mesh_f_stack = jnp.asarray(np.stack(fstack))

    def _predicted_box(self, T: np.ndarray, class_id: int = 0) -> np.ndarray:
        corners = (self._corners if self.estimators is None
                   else self._corners_by_cls[class_id])
        uv, front = g3.project_points(
            jnp.asarray(corners), jnp.asarray(self.estimator.K, jnp.float32),
            jnp.asarray(T, jnp.float32),
        )
        uv = np.asarray(uv)
        return np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()])

    @staticmethod
    def _iou(a, b) -> float:
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ar_a = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
        ar_b = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        return inter / max(ar_a + ar_b - inter, 1e-9)

    def step(self) -> Optional[MultiFrameResult]:
        color = self.camera.get_rgbd()
        if color is None:
            return None
        timings = {}

        t0 = time.time()
        det, masks, boxes_orig = self.detector(color, conf=self.conf)
        n_det = int(det.count())
        timings["detect"] = time.time() - t0
        det_boxes = np.asarray(boxes_orig[:n_det])
        det_classes = np.asarray(det.classes[:n_det])

        # --- associate detections to live tracks (greedy best-IoU) ---
        t0 = time.time()
        assigned_det = set()
        matched: list[tuple[TrackedObject, int]] = []
        for tr in self.tracks:
            best_j, best_iou = -1, self.iou_match
            pbox = self._predicted_box(tr.T_m2c, tr.class_id)
            for j in range(n_det):
                if j in assigned_det or det_classes[j] != tr.class_id:
                    continue
                iou = self._iou(pbox, det_boxes[j])
                if iou > best_iou:
                    best_iou, best_j = iou, j
            if best_j >= 0:
                assigned_det.add(best_j)
                matched.append((tr, best_j))
            else:
                tr.misses += 1
                if tr.filter is not None:
                    tr.filter.reset()
        timings["associate"] = time.time() - t0

        # --- batched track update for matched objects ---
        if matched:
            t0 = time.time()
            self._key, *keys = jax.random.split(self._key, len(matched) + 1)
            mask_batch = jnp.stack([masks[j] for _, j in matched])
            T_batch = jnp.asarray(
                np.stack([tr.T_m2c for tr, _ in matched]), jnp.float32
            )
            dists = jnp.asarray(
                [
                    max((0.05, 0.02)[2 - tr.post_init], self.icp_dist)
                    if tr.post_init else self.icp_dist
                    for tr, _ in matched
                ],
                jnp.float32,
            )
            batch_win = merge_windows([tr.win for tr, _ in matched])
            if self.estimators is None:
                T_new, fits, rmses, covs = _batched_track(
                    self.estimator._mesh_v, self.estimator._mesh_f,
                    mask_batch, self.camera.depth, T_batch,
                    self.estimator.intr, self.target_pts, jnp.stack(keys),
                    dists, win_hw=batch_win,
                )
            else:
                cls_idx = jnp.asarray(
                    [self._cls_row[tr.class_id] for tr, _ in matched],
                    jnp.int32,
                )
                T_new, fits, rmses, covs = _batched_track_multi(
                    self._mesh_v_stack, self._mesh_f_stack, cls_idx,
                    mask_batch, self.camera.depth, T_batch,
                    self.estimator.intr, self.target_pts, jnp.stack(keys),
                    dists, win_hw=batch_win,
                )
            T_new = np.asarray(jax.block_until_ready(T_new))
            fits = np.asarray(fits)
            covs = np.asarray(covs)
            for i, (tr, _) in enumerate(matched):
                tr.T_m2c = T_new[i]
                tr.T_out = (np.asarray(tr.filter(T_new[i]))
                            if tr.filter is not None else T_new[i])
                tr.misses = 0
                tr.age += 1
                tr.icp_fitness = float(fits[i])
                tr.pose_cov = covs[i]
                if tr.post_init:
                    tr.post_init -= 1
            timings["track_batch"] = time.time() - t0

        # --- retire stale tracks ---
        self.tracks = [t for t in self.tracks if t.misses <= self.max_misses]

        # --- spawn at most one new track per frame ---
        if len(self.tracks) < self.max_objects:
            for j in range(n_det):
                if j in assigned_det:
                    continue
                est = (self.estimator if self.estimators is None
                       else self.estimators.get(int(det_classes[j])))
                if est is None:
                    continue  # detected class has no registered CAD
                t0 = time.time()
                dst_cloud = self.camera.get_pcd_from_rgbd(np.asarray(masks[j]))
                H, _ = est.find_best_template_teaser(
                    dst_cloud, mask=masks[j]
                )
                H = np.asarray(g3.enforce_upright_pose_y_up(jnp.asarray(H)))
                intr = self.estimator.intr
                intr_r = g3.Intrinsics(
                    fx=intr.fx / 2, fy=intr.fy / 2, cx=intr.cx / 2,
                    cy=intr.cy / 2, width=intr.width // 2,
                    height=intr.height // 2,
                )
                diag_c = float(np.linalg.norm(est.mesh.extent))
                self.tracks.append(
                    TrackedObject(
                        track_id=self._next_id, class_id=int(det_classes[j]),
                        T_m2c=H, T_out=H,
                        filter=PoseFilter(self.smooth_alpha, self.smooth_beta)
                        if self.smooth_alpha < 1.0 else None,
                        win=window_for_object(intr_r, diag_c,
                                              float(H[2, 3])),
                    )
                )
                self._next_id += 1
                timings["init"] = time.time() - t0
                break

        res = MultiFrameResult(
            color=color, tracks=list(self.tracks), n_detections=n_det, timings=timings
        )
        if self.metrics is not None:
            self.metrics.log(
                {
                    "frame": "multi", "n_tracks": len(self.tracks),
                    "n_detections": n_det,
                    "timings_ms": {k: v * 1000 for k, v in timings.items()},
                }
            )
        return res
