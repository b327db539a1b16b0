"""The realtime tracking loop: INIT / TRACK / LOST state machine around a
single fused per-frame device program.

Re-architects reference main_realsense.py:27-129. The reference hops
host<->device four times per frame (Filament render -> CUDA YOLO -> C++ cloud
ops -> C++ ICP; SURVEY.md section 3.1); here the whole frame —
render-at-last-pose, masked back-projection, downsampling, ICP delta — is one
jitted program, with detection a second jitted program, and only the FSM and
overlay on the host.

Behavior parity:
  - warm-up requires 10 consecutive valid masks (main_realsense.py:55-66),
  - global init via template TEASER + upright snap (:68-75),
  - per-frame: render prev template (TARGET_PTS), detect, back-project,
    random downsample, ICP(0.01, identity init), T = delta @ T (:82-118),
  - re-initialize after >5 consecutive misses (:92-98).
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
from ..geom3d.cloud import PointCloud
from ..registration import icp_point_to_plane, icp_point_to_point
from ..render.raster import render_depth_mesh
from .detector import Detector
from .pose_estimator import PoseEstimator, _render_predicted
from .window import window_dims, window_for_object, window_origin


def _so3_log(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle vector (numpy, host-side filter math)."""
    cos = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    ang = float(np.arccos(cos))
    if ang < 1e-8:
        return np.zeros(3)
    if ang > np.pi - 1e-5:
        # near-pi: axis from the symmetric part (R + I has rank-1 column space)
        A = (R + np.eye(3)) * 0.5
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs from the off-diagonals
        if axis[0] > 0:
            axis[1] = np.copysign(axis[1], A[0, 1])
            axis[2] = np.copysign(axis[2], A[0, 2])
        elif axis[1] > 0:
            axis[2] = np.copysign(axis[2], A[1, 2])
        n = np.linalg.norm(axis)
        return axis / max(n, 1e-12) * ang
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return w * (ang / (2.0 * np.sin(ang)))


def _so3_exp(w: np.ndarray) -> np.ndarray:
    """Axis-angle vector -> rotation matrix (numpy)."""
    ang = float(np.linalg.norm(w))
    if ang < 1e-12:
        return np.eye(3)
    k = w / ang
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1.0 - np.cos(ang)) * (K @ K)


class PoseFilter:
    """SE(3) alpha-beta output filter: smooths the reported pose stream
    without re-entering the device loop (host-side, numpy).

    The tracking ICP estimates each frame independently given the rendered
    prediction, so under sensor noise the output pose jitters frame to
    frame. This filter runs a constant-velocity predictor in the error-twist
    domain (rotation via so3 log/exp, translation linear — the standard
    decoupled form) and blends the measurement in with gain ``alpha``; the
    velocity state absorbs a fraction ``beta`` of the innovation, so steady
    motion passes through WITHOUT the lag a plain EMA would add. alpha=1
    disables (output = measurement, reference parity). Reset on misses,
    re-inits, and candidate jumps, where the velocity state is stale.
    """

    def __init__(self, alpha: float = 0.5, beta: float = 0.3):
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.reset()

    def reset(self) -> None:
        self._T: Optional[np.ndarray] = None
        self._w = np.zeros(3)  # rotational velocity (axis-angle / frame)
        self._v = np.zeros(3)  # translational velocity (m / frame)

    def __call__(self, T_meas: np.ndarray) -> np.ndarray:
        T_meas = np.asarray(T_meas, np.float64)
        if self.alpha >= 1.0:
            return T_meas.astype(np.float32)
        if self._T is None:
            self._T = T_meas.copy()
            return T_meas.astype(np.float32)
        # constant-velocity prediction
        R_pred = _so3_exp(self._w) @ self._T[:3, :3]
        t_pred = self._T[:3, 3] + self._v
        # innovation (error twist)
        e_w = _so3_log(T_meas[:3, :3] @ R_pred.T)
        e_t = T_meas[:3, 3] - t_pred
        R_new = _so3_exp(self.alpha * e_w) @ R_pred
        t_new = t_pred + self.alpha * e_t
        # velocity absorbs beta of the innovation (first-order composition on
        # SO(3): per-frame angles are small, so log(exp(b e) exp(w)) ~ be + w)
        self._w = _so3_log(_so3_exp(self.beta * e_w) @ _so3_exp(self._w))
        self._v = self._v + self.beta * e_t
        T = np.eye(4)
        T[:3, :3] = R_new
        T[:3, 3] = t_new
        self._T = T
        return T.astype(np.float32)


def predict_pose_cv(T_cur: np.ndarray, T_prev: np.ndarray) -> np.ndarray:
    """Constant-velocity pose prediction: extrapolate the camera-frame delta
    of the last tracked step one frame forward.

    ``T_t = D @ T_{t-1}`` with ``D = T_t @ inv(T_{t-1})``, so the prediction
    is ``T_{t+1} = D @ T_t``. Used by the tracker's render-predict step when
    ``motion_model="constant_velocity"``: rendering the template at the
    predicted pose keeps the ICP correction small for fast motion, extending
    the trackable speed range beyond the reference's render-at-last-pose
    (main_realsense.py:82-84 renders at the previous estimate, which makes
    the ICP basin the binding constraint on object speed).
    """
    D = T_cur @ np.linalg.inv(T_prev)
    return (D @ T_cur).astype(np.float32)


@dataclass
class FrameResult:
    color: np.ndarray
    T_m2c: Optional[np.ndarray]
    state: str  # "init" | "track" | "lost"
    timings: dict = field(default_factory=dict)
    icp_fitness: float = 0.0
    icp_rmse: float = 0.0
    detected: bool = False
    # (6, 6) Gauss-Newton covariance of the pose's camera-frame left twist
    # (omega, t) from the frame's ICP (registration.icp._gn_covariance);
    # None on init/lost frames. sigma_* are its scalar summaries.
    pose_cov: Optional[np.ndarray] = None
    sigma_rot_deg: float = 0.0
    sigma_t_mm: float = 0.0
    # init frames only: render-score margin between the selected init pose
    # and the best OTHER candidate basin after the multi-frame rollout
    # (0.0 = rollout disabled or no competing basin). Small margins flag an
    # ambiguous initialization (near-symmetric views).
    init_margin: float = 0.0


def _cov_sigmas(cov: np.ndarray) -> tuple[float, float]:
    """Scalar uncertainty summaries of a 6x6 twist covariance: total rotation
    / translation standard deviations (sqrt of the 3x3 block traces)."""
    s_rot = float(np.sqrt(max(np.trace(cov[:3, :3]), 0.0)))
    s_t = float(np.sqrt(max(np.trace(cov[3:, 3:]), 0.0)))
    return np.degrees(s_rot), s_t * 1000.0


@partial(jax.jit, static_argnames=(
    "intr", "target_pts", "render_downscale", "icp_variant", "icp_kernel",
    "render_kind", "win_hw"))
def _track_step(ra, rb, mask, depth, T_m2c, intr, target_pts, key,
                icp_dist=0.01, render_downscale: int = 2,
                icp_variant: str = "p2p", icp_kernel: str = "none",
                render_kind: str = "mesh", win_hw="auto",
                icp_pose_tol=5e-5):
    """Fused frame program: pose -> rendered template -> ICP vs observed cloud
    -> updated pose. Fixed shapes, zero recompiles at camera rate.

    ``render_kind``: the predicted-view instrument. "mesh" (product) —
    ``(ra, rb) = (vertices, faces)``, exact triangle raster; "points" —
    ``(ra, rb) = (points, valid)``, the legacy splat, kept for point-only
    CADs. The splat's 3x3 scatter-min renders the surface ~6 mm toward the
    camera and dilates the silhouette 1 px (measured, tests/test_raster.py),
    which ICP converts into a systematic pose bias against real (unbiased)
    observations — invisible in closed-loop eval where the camera shares
    the splat, exposed by --observation mesh.

    TPU cost notes (profiled on v5e): the predicted view renders at
    1/render_downscale resolution (occlusion fidelity is unchanged for ICP
    sampling); outlier removal uses the approx_min_k partial-sort unit on a
    tight 4096-point budget (was the dominant cost at 8192 exact top_k).

    ``target_pts``: points per cloud for the ICP. The reference uses 100
    because CPU ICP is slow (main_realsense.py:17); the random-sampling noise
    floor (~spacing/sqrt(N)) then drifts through the compounding per-frame
    delta. ``target_pts=0`` selects DENSE mode — ICP on the full 4096-point
    compacted clouds, ~50x lower noise floor for single-digit-ms extra TPU
    work.

    ``win_hw``: object-window rasterization config (pipeline/window.py) —
    "auto" (default: windowed at product resolutions, full-frame on tiny
    test cameras), None (always full frame), or an explicit (h, w) window at
    the render resolution. Windowed, BOTH the predicted view and the
    observed cloud are restricted to a (h, w)-at-render-res region around
    the projected object.

    ``icp_variant``: "p2p" (reference parity, main_realsense.py:112-115) or
    "p2l" (point-to-plane on observed-cloud normals — capability extension).
    ``icp_kernel``: IRLS robust kernel "none" | "huber" | "tukey" applied to
    the per-pair residuals; robustifies against background bleed through an
    imperfect detection mask. Measured comparison: docs/PERFORMANCE.md.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # render CAD at last pose, sample template points (camera frame)
    r = render_downscale
    intr_r = g3.Intrinsics(
        fx=intr.fx / r, fy=intr.fy / r, cx=intr.cx / r, cy=intr.cy / r,
        width=intr.width // r, height=intr.height // r,
    )
    # object-window rasterization (pipeline/window.py): at product
    # resolutions both sides of the registration live in a fixed-size window
    # around the projected object — the raster pays tiles-in-window x faces
    # instead of tiles-in-frame x faces, and the backproject/sample pools
    # shrink ~5x. Inside the window the rendered depth is bit-identical to
    # the full-frame render; the observed cloud is additionally restricted
    # to the window (mask pixels outside it — stale detections or
    # background bleed — are excluded, which is the desired behavior for a
    # track update). Static config; tiny test cameras stay full-frame.
    win = window_dims(intr_r, win_hw) if render_kind == "mesh" else None
    if win is not None:
        wh, ww = win
        orig_r = window_origin(ra, T_m2c, intr_r, wh, ww)
        dtpl = render_depth_mesh(ra, rb, T_m2c, intr_r, near=0.01, far=5.0,
                                 origin=orig_r.astype(jnp.float32), out_hw=win)
        tpl = g3.backproject_depth(dtpl, intr_r, depth_min=0.01,
                                   depth_max=5.0, origin=orig_r)
    else:
        dtpl = _render_predicted(render_kind, ra, rb, T_m2c, intr_r)
        tpl = g3.backproject_depth(dtpl, intr_r, depth_min=0.01, depth_max=5.0)
    # spatially-uniform working sets: compact() keeps the raster-TOP of any
    # view larger than the budget (an object covering ~18k px at 640x480
    # would register against its top quarter only, biasing the pose and
    # capping ICP fitness at coverage/4096 regardless of alignment)
    prev_down = g3.random_sample(k3, tpl, 4096)

    # observed masked cloud
    if win is not None:
        orig_f = orig_r * r
        dwin = jax.lax.dynamic_slice(depth, (orig_f[1], orig_f[0]),
                                     (wh * r, ww * r))
        mwin = jax.lax.dynamic_slice(mask, (orig_f[1], orig_f[0]),
                                     (wh * r, ww * r))
        obs = g3.backproject_depth(dwin, intr, mask=mwin, depth_min=1e-6,
                                   origin=orig_f)
    else:
        obs = g3.backproject_depth(depth, intr, mask=mask, depth_min=1e-6)
    obs = g3.random_sample(k4, obs, 4096)
    dst_down = g3.remove_statistical_outlier(obs, 20, 1.0, approx=True)

    if target_pts:
        prev_down = g3.random_sample(k1, prev_down, target_pts)
        dst_down = g3.random_sample(k2, dst_down, target_pts)

    # product-resolution convergence profile (gated like the search's
    # use_half): at product resolutions the p2p ICP runs with Besl-McKay
    # step extrapolation (registration/icp.py accel=True) — p2p crawls
    # LINEARLY along tangential slide directions (~23 strict iterations for
    # the last 1.5 mm on the bench scene, 68% of the fused frame), and the
    # geometric-series jump + pose-delta exit reaches a BETTER single-step
    # residual in ~15 NN passes (measured 0.72 mm @ 4.6 ms vs strict's
    # 0.94 mm @ 6.1 ms). ``icp_pose_tol`` sets the raw-step exit (traced:
    # the multi-object batch runs a relaxed 1e-4 profile, single-object the
    # accurate 5e-5). Tiny test cameras keep the exact Open3D-parity
    # sequence (accel off).
    use_accel = win is not None and icp_variant == "p2p"
    if icp_variant == "p2l":
        dst_down = g3.estimate_normals(
            dst_down, radius=0.025, max_nn=16, orient_towards=jnp.zeros(3)
        )
        icp = icp_point_to_plane(
            prev_down, dst_down, max_corr_dist=icp_dist, max_iterations=30,
            robust=icp_kernel, with_cov=True,
        )
    else:
        icp = icp_point_to_point(
            prev_down, dst_down, max_corr_dist=icp_dist, max_iterations=30,
            robust=icp_kernel, with_cov=True, accel=use_accel,
            accel_pose_tol=icp_pose_tol,
        )
    T_new = icp.T @ T_m2c
    # icp.cov: 6x6 Gauss-Newton covariance of the camera-frame left twist of
    # the per-frame DELTA — which is also the left twist of T_new itself
    # (T_new = exp(delta) icp.T T_m2c for a perturbed delta), so it is the
    # reported pose's uncertainty in the camera frame
    return T_new, icp.fitness, icp.inlier_rmse, icp.cov


class Tracker:
    """Host-side FSM driving the fused frame program."""

    def __init__(
        self,
        camera,
        estimator: PoseEstimator,
        detector: Detector,
        target_pts: int = 100,
        track_every: int = 1,
        conf: float = 0.7,
        class_id: int = 0,
        max_misses: int = 5,
        warmup_frames: int = 10,
        max_init_frames: int = 200,
        icp_dist: float = 0.01,
        icp_variant: str = "p2p",
        icp_kernel: str = "none",
        min_fitness: float = 0.0,
        fitness_patience: int = 3,
        reinit_fitness: float = 0.0,
        reinit_patience: int = 8,
        motion_model: str = "none",
        smooth_alpha: float = 1.0,
        smooth_beta: float = 0.3,
        init_rollout: int = 0,
        init_topk: int = 3,
        seed: int = 0,
        metrics=None,
    ):
        self.camera = camera
        self.estimator = estimator
        self.detector = detector
        self.target_pts = target_pts
        self.track_every = track_every
        self.conf = conf
        self.class_id = class_id
        self.max_misses = max_misses
        self.icp_dist = icp_dist
        self.icp_variant = icp_variant
        self.icp_kernel = icp_kernel
        # pose-candidate fallback: near-symmetric objects can rank a flipped
        # pose first in the single-view init; when ICP fitness stays below
        # min_fitness for fitness_patience tracked frames, switch to the next
        # ranked init candidate (0.0 disables)
        self.min_fitness = min_fitness
        self.fitness_patience = fitness_patience
        # global failure detection: sustained fitness below reinit_fitness
        # (after candidate fallback had its chance) declares the track lost
        # and drops the FSM back to INIT for a fresh global search. 0.0
        # disables (reference parity: re-init on detection misses only,
        # main_realsense.py:100). When both are enabled, reinit_patience
        # should exceed fitness_patience x candidate count so the cheap
        # fallback runs first.
        self.reinit_fitness = reinit_fitness
        self.reinit_patience = reinit_patience
        self._low_fitness_reinit = 0
        # "none" (reference parity: render at the last pose) or
        # "constant_velocity" (render at the extrapolated pose; see
        # predict_pose_cv) — extends the trackable speed range
        if motion_model not in ("none", "constant_velocity"):
            raise ValueError(f"unknown motion_model {motion_model!r}")
        self.motion_model = motion_model
        # multi-frame init (capability extension over the reference's
        # single-frame init, main_realsense.py:68-77): after the global
        # search, TRACK the top-k DISTINCT candidate basins through
        # ``init_rollout`` extra warm-up frames in one vmapped program and
        # select by the render score on the last of them — near-symmetric
        # views that tie on a single frame separate once the viewpoint
        # changes. 0 disables (reference parity: pick the single-frame
        # winner).
        self.init_rollout = init_rollout
        self.init_topk = init_topk
        # OUTPUT-only SE(3) alpha-beta smoothing (PoseFilter): the reported
        # pose stream is filtered; the internal render-predict state keeps
        # the raw ICP chain so the filter can never destabilize tracking.
        # smooth_alpha=1 disables (reference parity).
        self._filter = (
            PoseFilter(smooth_alpha, smooth_beta) if smooth_alpha < 1.0 else None
        )
        self._T_prev: Optional[np.ndarray] = None  # previous tracked pose
        self._candidates: list = []
        self._candidate_idx = 0
        self._low_fitness = 0
        self.warmup_frames = warmup_frames
        self.max_init_frames = max_init_frames
        self._key = jax.random.PRNGKey(seed)

        self.metrics = metrics  # optional utils.MetricsLogger

        self.initialized = False
        self.errorcounter = 0
        self.frame_id = 0
        self.T_m2c: Optional[np.ndarray] = None
        self.history: list[FrameResult] = []
        # object-window bucket for the fused/track programs: selected at
        # init from the CAD diameter and the object's distance
        # (window_for_object — a FIXED window crops objects that project
        # larger than it and silently degrades orientation accuracy), then
        # re-selected when the distance drifts > 25%. "auto" until the
        # first init (the conservative resolution-gated default).
        self._diag = float(np.linalg.norm(estimator.mesh.extent))
        self._win_hw = "auto"
        self._win_z: Optional[float] = None
        # post-init radius taper: the global search can land a couple of cm
        # off (voxel-scale basins); the first tracked frames finish the init
        # refinement at the reference's INIT ICP radius (0.05,
        # main_realsense.py:112-115) before dropping to the tracking radius
        self._post_init = 0

        # fused detect+track program: ONE dispatch per tracked frame instead
        # of two (detection then track), available when the detector exposes
        # its flax model (stub detectors in tests fall back to the 2-call
        # path). Cached per window bucket (the bucket is a static shape).
        self._can_fuse = (hasattr(detector, "model")
                          and hasattr(detector, "variables"))
        self._fused_progs: dict = {}

    @property
    def _fused(self):
        if not self._can_fuse:
            return None
        key = self._win_hw
        if key not in self._fused_progs:
            self._fused_progs[key] = self._build_fused_step(key)
        return self._fused_progs[key]

    def _intr_r(self):
        intr = self.estimator.intr
        return g3.Intrinsics(
            fx=intr.fx / 2, fy=intr.fy / 2, cx=intr.cx / 2, cy=intr.cy / 2,
            width=intr.width // 2, height=intr.height // 2,
        )

    def _select_window(self, z: float) -> None:
        """Pick the static window bucket for the current object distance
        (init / re-init / >25% distance drift — never per frame, so the jit
        cache holds a handful of programs)."""
        self._win_hw = window_for_object(self._intr_r(), self._diag, z)
        self._win_z = float(z)

    def _build_fused_step(self, win_hw):
        from ..models import yolo as Y

        det = self.detector
        model, imgsz, max_det = det.model, det.imgsz, det.max_det
        intr = self.estimator.intr
        target_pts = self.target_pts
        icp_variant, icp_kernel = self.icp_variant, self.icp_kernel

        @partial(jax.jit, static_argnames=())
        def fused(variables, color_bgr, depth, T, key, conf, icp_dist):
            lb, meta = Y.letterbox(color_bgr, imgsz)
            raw = model.apply(variables, lb[None], train=False)
            boxes, cls, mc = Y.decode_boxes(raw)
            d = Y.nms(
                boxes[0], cls[0], mc[0], conf_thres=conf, iou_thres=0.7,
                pre_nms=1024, max_det=max_det,
            )
            # tracking consumes only the top detection's mask: assemble ONE
            # (assembling all max_det masks dominates the detect cost)
            mask = Y.assemble_masks(
                raw["proto"][0], d.coeffs[:1], d.boxes[:1], d.valid[:1], meta,
                intr.height, intr.width,
            )[0]
            T_new, fit, rmse, cov = _track_step(
                self.estimator._mesh_v, self.estimator._mesh_f,
                mask, depth, T, intr, target_pts, key, icp_dist,
                icp_variant=icp_variant, icp_kernel=icp_kernel,
                win_hw=win_hw,
            )
            n = d.count()
            ok = (n > 0) & jnp.any(mask)
            T_out = jnp.where(ok, T_new, T)
            return T_out, ok, fit, rmse, cov

        return fused

    def _record(self, res: "FrameResult") -> "FrameResult":
        self.history.append(res)
        if self.metrics is not None:
            from ..utils.metrics_log import FrameMetrics

            self.metrics.log(
                FrameMetrics(
                    frame_id=self.frame_id, state=res.state,
                    timings_ms={k: v * 1000 for k, v in res.timings.items()},
                    icp_fitness=res.icp_fitness, icp_rmse=res.icp_rmse,
                    pose=None if res.T_m2c is None else np.asarray(res.T_m2c).tolist(),
                    detected=res.detected,
                    sigma_rot_deg=res.sigma_rot_deg, sigma_t_mm=res.sigma_t_mm,
                )
            )
        return res

    def _maybe_fallback(self, fitness: float) -> None:
        """Advance to the next ranked init candidate after sustained low
        ICP fitness (disabled when min_fitness == 0)."""
        if self.min_fitness <= 0 or not self._candidates:
            return
        if fitness >= self.min_fitness:
            self._low_fitness = 0
            return
        self._low_fitness += 1
        if (
            self._low_fitness >= self.fitness_patience
            and self._candidate_idx + 1 < len(self._candidates)
        ):
            self._candidate_idx += 1
            if self._filter is not None:
                self._filter.reset()  # pose jump: filter state is stale
            _, T, idx = self._candidates[self._candidate_idx]
            self.T_m2c = np.asarray(
                g3.enforce_upright_pose_y_up(jnp.asarray(np.asarray(T)))
            )
            self._low_fitness = 0
            self._post_init = 2  # re-arm the init-refinement radius ladder
            self._T_prev = None  # velocity is meaningless across a pose jump

    def _maybe_reinit(self, fitness: float) -> bool:
        """Global failure detection: sustained ICP fitness below
        ``reinit_fitness`` means the current pose basin is wrong (object
        kidnapped / track diverged) and the ranked-candidate fallback did not
        recover; drop the FSM back to INIT so the next step runs the global
        template search. Returns True when triggered (the caller reports the
        frame as "lost")."""
        if self.reinit_fitness <= 0:
            return False
        if fitness >= self.reinit_fitness:
            self._low_fitness_reinit = 0
            return False
        self._low_fitness_reinit += 1
        if self._low_fitness_reinit < self.reinit_patience:
            return False
        self._low_fitness_reinit = 0
        self.initialized = False
        self._T_prev = None
        if self._filter is not None:
            self._filter.reset()
        self.errorcounter = 0
        return True

    def _detect(self, color):
        """One detection pass; returns (mask jnp (H, W) bool or None)."""
        det, masks, _ = self.detector(color, conf=self.conf)
        n = int(det.count())
        if n == 0:
            return None
        return masks[0]

    def _initialize(self) -> Optional[FrameResult]:
        """Warm-up + global pose (main_realsense.py:55-77)."""
        consecutive = 0
        mask = None
        color = None
        for _ in range(self.max_init_frames):
            color = self.camera.get_rgbd()
            if color is None:
                return None
            m = self._detect(color)
            if m is None or not bool(jnp.any(m)):
                consecutive = 0
                continue
            mask = m
            consecutive += 1
            if consecutive >= self.warmup_frames:
                break
        if mask is None or consecutive < self.warmup_frames:
            return None

        t0 = time.time()
        dst_cloud = self.camera.get_pcd_from_rgbd(np.asarray(mask))
        H, _, candidates = self.estimator.find_best_template_candidates(
            dst_cloud, mask=mask
        )
        H = np.asarray(g3.enforce_upright_pose_y_up(jnp.asarray(H)))
        self._candidates = candidates
        self._select_window(float(H[2, 3]))
        init_margin = 0.0
        if self.init_rollout > 0 and len(candidates) > 1:
            H, init_margin = self._rollout_init(H, candidates)
        self.T_m2c = H
        self._candidate_idx = 0
        self._low_fitness = 0
        self._post_init = 2
        self._T_prev = None
        if self._filter is not None:
            self._filter.reset()
        self._low_fitness_reinit = 0
        self.initialized = True
        self.errorcounter = 0
        return FrameResult(
            color=color, T_m2c=H, state="init",
            timings={"global_registration": time.time() - t0}, detected=True,
            init_margin=init_margin,
        )

    def _rollout_init(self, H: np.ndarray, candidates) -> tuple:
        """Multi-frame init disambiguation: track the top-k DISTINCT
        candidate basins through ``init_rollout`` additional warm-up frames
        (all candidates advance in ONE vmapped fused step per frame — the
        frame is shared, each candidate renders its own predicted window)
        and select by the render depth+silhouette score on the last rolled
        frame. Returns ``(T_winner, margin)`` where ``margin`` is the score
        gap to the best competing basin (small = still ambiguous).

        Falls back to the single-frame winner ``H`` when fewer than two
        distinct basins exist or the camera/detector yields no usable
        rollout frame (margin 0.0). The candidate fallback list is reordered
        so the rollout winner's basin is first."""
        from .pose_estimator import score_pose_candidates

        est = self.estimator
        diag = float(np.linalg.norm(est.mesh.extent))
        kept: list = []
        for s, T, i in candidates:
            Tn = np.asarray(T)
            dup = False
            for _, Tk, _ in kept:
                R = Tn[:3, :3] @ Tk[:3, :3].T
                ang = np.arccos(np.clip((np.trace(R) - 1.0) / 2, -1.0, 1.0))
                if ang < 0.17 and np.linalg.norm(
                        Tn[:3, 3] - Tk[:3, 3]) < 0.05 * diag:
                    dup = True
                    break
            if not dup:
                kept.append((s, Tn, i))
            if len(kept) >= self.init_topk:
                break
        if len(kept) < 2:
            return H, 0.0
        K = len(kept)
        Ts = jnp.asarray(np.stack([
            np.asarray(g3.enforce_upright_pose_y_up(jnp.asarray(T)))
            for _, T, _ in kept
        ]), jnp.float32)
        step = jax.vmap(
            partial(_track_step, win_hw=self._win_hw),
            in_axes=(None, None, None, None, 0, None, None, 0, None),
        )
        last = None
        for _ in range(self.init_rollout):
            color = self.camera.get_rgbd()
            if color is None:
                break
            m = self._detect(color)
            if m is None or not bool(jnp.any(m)):
                continue
            self._key, k = jax.random.split(self._key)
            Ts, _fits, _rmse, _cov = step(
                est._mesh_v, est._mesh_f, m, self.camera.depth, Ts,
                est.intr, self.target_pts, jax.random.split(k, K),
                jnp.float32(0.05),  # init-refinement radius
            )
            last = (self.camera.depth, m)
        if last is None:
            return H, 0.0
        scores = np.asarray(score_pose_candidates(
            est._mesh_v, est._mesh_f, Ts, last[0], last[1], est.intr,
            win_hw=self._win_hw,
        ))
        order = np.argsort(scores)
        w = int(order[0])
        margin = float(scores[order[1]] - scores[order[0]])
        win_idx = kept[w][2]
        # stable reorder: the winner's template candidate leads the fallback
        # ladder, everything else keeps its search ranking
        self._candidates = sorted(
            self._candidates, key=lambda c: 0 if c[2] == win_idx else 1
        )
        return np.asarray(Ts[w]), margin

    def step(self) -> Optional[FrameResult]:
        """One loop iteration. Returns None when the stream ends."""
        if not self.initialized:
            res = self._initialize()
            if res is not None:
                self._record(res)
            return res

        color = self.camera.get_rgbd()
        if color is None:
            return None
        timings = {}
        self.frame_id += 1
        if self.frame_id % self.track_every != 0:
            self._T_prev = None  # velocity spans an untracked gap -> stale
            return self._record(
                FrameResult(color=color, T_m2c=self.T_m2c, state="track")
            )

        # first tracked frames after a (re-)init run at the init-refinement
        # radius ladder (0.05 then 0.02, floored at the configured tracking
        # radius), then the tracking radius; the radius is a traced scalar,
        # so this costs no recompiles. The ladder advances only on frames
        # that actually track (a detection miss must not consume a rung).
        if self._post_init:
            eff_dist = max((0.05, 0.02)[2 - self._post_init], self.icp_dist)
        else:
            eff_dist = self.icp_dist

        # render-predict pose: last estimate (reference behavior) or the
        # constant-velocity extrapolation when a previous tracked pose exists
        T_cur = np.asarray(self.T_m2c)
        if self._win_z is not None:
            z = float(T_cur[2, 3])
            if abs(z - self._win_z) > 0.25 * max(self._win_z, 1e-3):
                self._select_window(z)
        if self.motion_model == "constant_velocity" and self._T_prev is not None:
            T_render = predict_pose_cv(T_cur, self._T_prev)
        else:
            T_render = T_cur

        if self._fused is not None:
            t0 = time.time()
            self._key, k = jax.random.split(self._key)
            T_new, ok, fitness, rmse, cov = self._fused(
                self.detector.variables, jnp.asarray(color), self.camera.depth,
                jnp.asarray(T_render, jnp.float32), k,
                jnp.float32(self.conf), jnp.float32(eff_dist),
            )
            if not bool(ok):
                timings["frame"] = time.time() - t0
                self.errorcounter += 1
                self._T_prev = None
                if self._filter is not None:
                    self._filter.reset()
                if self.errorcounter > self.max_misses:
                    self.initialized = False
                return self._record(
                    FrameResult(color=color, T_m2c=self.T_m2c, state="lost",
                                timings=timings)
                )
            self.errorcounter = 0
            if self._post_init:
                self._post_init -= 1
            self._T_prev = T_cur
            self.T_m2c = np.asarray(T_new)
            timings["frame"] = time.time() - t0
            T_rep = (self._filter(self.T_m2c) if self._filter is not None
                     else self.T_m2c)
            self._maybe_fallback(float(fitness))
            state = "lost" if self._maybe_reinit(float(fitness)) else "track"
            cov = np.asarray(cov)
            s_rot, s_t = _cov_sigmas(cov)
            return self._record(
                FrameResult(
                    color=color, T_m2c=T_rep, state=state, timings=timings,
                    icp_fitness=float(fitness), icp_rmse=float(rmse), detected=True,
                    pose_cov=cov, sigma_rot_deg=s_rot, sigma_t_mm=s_t,
                )
            )

        t0 = time.time()
        mask = self._detect(color)
        timings["detect"] = time.time() - t0
        if mask is None or not bool(jnp.any(mask)):
            self.errorcounter += 1
            self._T_prev = None
            if self._filter is not None:
                self._filter.reset()
            if self.errorcounter > self.max_misses:
                self.initialized = False
            return self._record(
                FrameResult(color=color, T_m2c=self.T_m2c, state="lost", timings=timings)
            )
        self.errorcounter = 0
        if self._post_init:
            self._post_init -= 1

        t0 = time.time()
        self._key, k = jax.random.split(self._key)
        T_new, fitness, rmse, cov = _track_step(
            self.estimator._mesh_v, self.estimator._mesh_f,
            mask, self.camera.depth, jnp.asarray(T_render, jnp.float32),
            self.estimator.intr, self.target_pts, k,
            icp_dist=jnp.float32(eff_dist),
            icp_variant=self.icp_variant, icp_kernel=self.icp_kernel,
            win_hw=self._win_hw,
        )
        T_new = np.asarray(jax.block_until_ready(T_new))
        timings["track_step"] = time.time() - t0
        self._T_prev = T_cur
        self.T_m2c = T_new
        T_rep = self._filter(T_new) if self._filter is not None else T_new
        self._maybe_fallback(float(fitness))
        state = "lost" if self._maybe_reinit(float(fitness)) else "track"
        cov = np.asarray(cov)
        s_rot, s_t = _cov_sigmas(cov)
        return self._record(
            FrameResult(
                color=color, T_m2c=T_rep, state=state, timings=timings,
                icp_fitness=float(fitness), icp_rmse=float(rmse), detected=True,
                pose_cov=cov, sigma_rot_deg=s_rot, sigma_t_mm=s_t,
            )
        )
