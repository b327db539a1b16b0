"""Camera sources: the RealSenseCamera surface, backed by real hardware, a
recorded replay, or a synthetic renderer.

The reference binds directly to librealsense (RealSenseClass.py); SURVEY.md
section 2.2 calls for a ``CameraSource`` protocol with a real impl and a
replay/synthetic impl so the full tracking loop runs headless in CI and on
TPU pods. Surface parity: ``get_rgbd() -> color``, ``rs_get_intrinsics() ->
(intr, K)``, ``get_pcd_from_rgbd(mask) -> cloud``, ``stop()``.
"""
from __future__ import annotations

from typing import Iterable, Optional, Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom3d as g3
from ..geom3d.cloud import PointCloud
from ..render.points import render_shaded
from .filters import hole_filling_filter, spatial_filter, temporal_filter

PCD_CAPACITY = 16384  # compacted per-frame cloud budget


class CameraSource(Protocol):
    def get_rgbd(self): ...
    def rs_get_intrinsics(self): ...
    def get_pcd_from_rgbd(self, mask) -> PointCloud: ...
    def stop(self) -> None: ...


class _BaseCamera:
    """Shared depth->cloud path (RealSenseClass.get_pcd_from_rgbd parity:
    masked depth -> back-projection -> statistical outlier removal 20/1.0)."""

    intrinsics: g3.Intrinsics
    color: Optional[np.ndarray] = None
    depth: Optional[jnp.ndarray] = None  # meters, filtered

    def rs_get_intrinsics(self):
        K = self.intrinsics.K
        return self.intrinsics, K

    def get_pcd_from_rgbd(self, mask) -> PointCloud:
        if self.depth is None:
            raise RuntimeError("call get_rgbd() before get_pcd_from_rgbd()")
        return _depth_to_cloud(self.depth, jnp.asarray(np.asarray(mask)), self.intrinsics)

    def stop(self) -> None:
        pass


from functools import partial


def _as_mesh_arrays(mesh):
    """Accept a TriangleMesh or a (vertices, faces) pair -> device arrays."""
    if hasattr(mesh, "vertices"):
        v, f = mesh.vertices, mesh.faces
    else:
        v, f = mesh
    return jnp.asarray(np.asarray(v, np.float32)), jnp.asarray(np.asarray(f, np.int32))


def _render_mesh_frame(mesh_arrays, T, intr):
    """One triangle-raster observation frame: exact depth + gradient-shaded
    color (the splat-independent instrument)."""
    from ..render.raster import render_depth_mesh, shade_depth_image

    v, f = mesh_arrays
    d = render_depth_mesh(v, f, jnp.asarray(T, jnp.float32), intr,
                          near=0.01, far=10.0)
    rgb = shade_depth_image(d, intr)
    return np.asarray(d), np.asarray(rgb)


@partial(jax.jit, static_argnames=("intr",))
def _depth_to_cloud(depth, mask, intr) -> PointCloud:
    cloud = g3.backproject_depth(depth, intr, mask=mask, depth_min=1e-6)
    # stratified sample, not compact(): masks covering more than
    # PCD_CAPACITY pixels would otherwise lose their raster-bottom slice
    # (deterministic key — same frame, same cloud)
    cloud = g3.random_sample(jax.random.PRNGKey(0), cloud, PCD_CAPACITY)
    return g3.remove_statistical_outlier(cloud, nb_neighbors=20, std_ratio=1.0)


class ReplayCamera(_BaseCamera):
    """Replays recorded (color, depth) frames — the headless CI camera.

    frames: sequence of (color HxWx3 uint8 BGR, depth HxW float32 meters).
    Applies the same spatial/temporal/hole-fill conditioning as the live
    camera unless ``filter_depth=False``. Loops when exhausted if ``loop``.
    """

    def __init__(self, frames: Sequence, intrinsics: g3.Intrinsics,
                 filter_depth: bool = True, loop: bool = True):
        self.frames = list(frames)
        if not self.frames:
            raise ValueError("ReplayCamera needs at least one frame")
        self.intrinsics = intrinsics
        self.filter_depth = filter_depth
        self.loop = loop
        self._i = 0
        self._prev = None

    def get_rgbd(self):
        if self._i >= len(self.frames):
            if not self.loop:
                return None
            self._i = 0
        color, depth = self.frames[self._i]
        self._i += 1
        d = jnp.asarray(depth, jnp.float32)
        if self.filter_depth:
            d = spatial_filter(d)
            if self._prev is not None:
                d = temporal_filter(d, self._prev)
            self._prev = d
            d = hole_filling_filter(d)
        self.color = np.asarray(color)
        self.depth = d
        return self.color

    @property
    def exhausted(self) -> bool:
        return (not self.loop) and self._i >= len(self.frames)


class SyntheticCamera(_BaseCamera):
    """Renders a CAD model along a pose trajectory — ground-truth-bearing
    camera for tests and benchmarks.

    poses: iterable of 4x4 model->camera transforms. Each ``get_rgbd`` renders
    the next pose (depth via the point-splat z-buffer, color via the headlight
    shader) and remembers it in ``current_gt``.

    ``occluder=(x0_px, x1_px, z_m)`` places a static vertical plate at
    constant camera depth ``z_m`` covering image columns ``[x0, x1)`` —
    a screen-space stand-in for a foreground obstruction (pole, arm, shelf
    edge) passing in front of the object. Pixels where the plate is nearer
    than the rendered geometry take its depth and a flat gray color.

    ``background_depth > 0`` fills empty pixels with a flat wall at that
    depth (clutter for mask-bleed robustness runs).

    ``object_mask`` after each ``get_rgbd`` is the ground-truth *visible*
    object silhouette (object pixels not hidden by the occluder) — what a
    perfect segmentation model would output even amid clutter.

    Multi-instance scenes: when ``poses`` yields a stacked ``(N, 4, 4)``
    array, each frame renders N instances of the CAD and composites them by
    nearest depth (mutual occlusion included). ``current_gt`` is then
    ``(N, 4, 4)``, ``object_masks`` holds the N per-instance *visible*
    silhouettes (each instance's z-buffer-winning pixels, minus the
    occluder), and ``object_mask`` stays their union. Single-pose streams
    keep the exact legacy surface. ``instance_geoms`` makes the instances
    heterogeneous (multi-CLASS scenes): instance i renders
    ``instance_geoms[i % len]`` instead of the shared CAD.

    ``mesh`` (a ``render.TriangleMesh``, or ``(vertices, faces)``) switches
    the observation instrument from the point splat to the exact triangle
    rasterizer (``render.raster``): depth is rasterized from the CAD's
    actual faces and color is shaded from depth gradients. Instrument
    independence (VERDICT round-3 item 2; the reference's analog is
    externally captured BOP data, main_image.py:98-115): the tracker/search
    render predicted views through the triangle raster, so the DEFAULT
    splat camera is already a different instrument with measured biases
    (~6 mm scatter-min depth pull, 1 px silhouette dilation —
    tests/test_raster.py) the estimator cannot cancel; ``mesh`` mode
    instead provides exact frames (raster verified < 1 mm against analytic
    closed forms), separating instrument error from estimator error.
    ``instance_meshes`` is the multi-instance equivalent of
    ``instance_geoms``.
    """

    def __init__(
        self,
        cad_points: np.ndarray,
        cad_normals: np.ndarray,
        poses: Iterable[np.ndarray],
        intrinsics: g3.Intrinsics,
        noise_sigma: float = 0.0,
        background_depth: float = 0.0,
        occluder: Optional[tuple] = None,
        seed: int = 0,
        filter_depth: bool = False,
        instance_geoms: Optional[list] = None,
        mesh=None,
        instance_meshes: Optional[list] = None,
        depth_fn=None,
    ):
        self.intrinsics = intrinsics
        self._pts = jnp.asarray(cad_points)
        self._nrm = jnp.asarray(cad_normals)
        self._valid = jnp.ones(len(cad_points), bool)
        # heterogeneous multi-instance scenes: optional [(points, normals),
        # ...] — instance i of a stacked pose renders
        # instance_geoms[i % len(instance_geoms)] instead of the shared CAD
        self._inst = None
        if instance_geoms is not None:
            self._inst = [
                (jnp.asarray(p), jnp.asarray(n), jnp.ones(len(p), bool))
                for p, n in instance_geoms
            ]
        # triangle-raster observation instrument (independent of the splat)
        self._mesh = _as_mesh_arrays(mesh) if mesh is not None else None
        # fully-external observation instrument: ``depth_fn(T_m2c) ->
        # (H, W) np depth`` (e.g. camera.analytic's closed-form ray-cast —
        # shares NO code with the render stack). Single-pose streams only;
        # takes precedence over ``mesh``/the splat.
        self._depth_fn = depth_fn
        self._inst_mesh = (
            [_as_mesh_arrays(m) for m in instance_meshes]
            if instance_meshes is not None else None
        )
        self._poses = iter(poses)
        self._noise = noise_sigma
        self._bg = background_depth
        if occluder is not None:
            x0, x1, z = occluder
            if not (0 <= x0 < x1 <= intrinsics.width) or z <= 0:
                raise ValueError(f"bad occluder {occluder!r}")
        self._occluder = occluder
        self.object_mask: Optional[np.ndarray] = None
        self.object_masks: Optional[np.ndarray] = None  # (N, H, W) multi-instance
        self.frames_served = 0  # camera-frame clock (recovery-latency evals)
        self._rng = np.random.default_rng(seed)
        # apply the RealSense post-processing chain (RealSenseClass.py:21-23
        # configures spatial+temporal+hole-fill) so noisy synthetic streams
        # see the same depth conditioning as the real camera path
        self.filter_depth = filter_depth
        self._prev: Optional[jnp.ndarray] = None
        self.current_gt: Optional[np.ndarray] = None

    def get_rgbd(self):
        try:
            T = next(self._poses)
        except StopIteration:
            return None
        self.frames_served += 1
        T = np.asarray(T, np.float32)
        self.current_gt = T
        if T.ndim == 2:
            if self._depth_fn is not None:
                d = np.asarray(self._depth_fn(T), np.float32)
                rgb = np.where((d > 0)[..., None],
                               np.float32(0.6), np.float32(1.0))
            elif self._mesh is not None:
                d, rgb = _render_mesh_frame(self._mesh, T, self.intrinsics)
            else:
                depth, rgb = render_shaded(
                    self._pts, self._nrm, self._valid, jnp.asarray(T),
                    self.intrinsics, near=0.01, far=10.0,
                )
                d = np.asarray(depth)
                rgb = np.asarray(rgb)
            return self._finish_frame(d, rgb, (d > 0)[None])
        # multi-instance composite: nearest-depth merge of per-instance
        # renders; an instance's visible mask = the pixels it wins
        depths, rgbs = [], []
        for i, Ti in enumerate(T):
            if self._inst_mesh is not None or self._mesh is not None:
                m = (
                    self._inst_mesh[i % len(self._inst_mesh)]
                    if self._inst_mesh is not None else self._mesh
                )
                di, ri = _render_mesh_frame(m, Ti, self.intrinsics)
                depths.append(di)
                rgbs.append(ri)
                continue
            pts, nrm, val = (
                self._inst[i % len(self._inst)] if self._inst
                else (self._pts, self._nrm, self._valid)
            )
            di, ri = render_shaded(
                pts, nrm, val, jnp.asarray(Ti),
                self.intrinsics, near=0.01, far=10.0,
            )
            depths.append(np.asarray(di))
            rgbs.append(np.asarray(ri))
        D = np.stack(depths)  # (N, H, W)
        Z = np.where(D > 0, D, np.inf)
        zmin = Z.min(0)
        d = np.where(np.isinf(zmin), 0.0, zmin).astype(np.float32)
        visible = (D > 0) & (Z <= zmin[None] + 1e-6)
        rgb = np.ones_like(rgbs[0])  # render_shaded's white background
        for i in range(len(T)):
            rgb = np.where(visible[i][..., None], rgbs[i], rgb)
        return self._finish_frame(d, rgb, visible)

    def _finish_frame(self, d, rgb, visible):
        """Shared occluder/background/noise/filter tail; ``visible`` is the
        (N, H, W) per-instance visible-silhouette stack (N=1 single-pose)."""
        if self._occluder is not None:
            x0, x1, z = self._occluder
            stripe = np.zeros_like(d, bool)
            stripe[:, int(x0):int(x1)] = True
            covers = stripe & ((d <= 0) | (d > z))
            d = np.where(covers, np.float32(z), d)
            rgb = np.where(covers[..., None], np.float32(0.5), rgb)
            visible = visible & ~covers[None]
        self.object_masks = visible
        self.object_mask = visible.any(0)
        if self._bg > 0:
            d = np.where(d == 0, self._bg, d)
        if self._noise > 0:
            d = np.where(d > 0, d + self._rng.normal(0, self._noise, d.shape), d)
        dj = jnp.asarray(d.astype(np.float32))
        if self.filter_depth:
            dj = spatial_filter(dj)
            if self._prev is not None:
                dj = temporal_filter(dj, self._prev)
            self._prev = dj
            dj = hole_filling_filter(dj)
        self.depth = dj
        # BGR, contiguous (cv2 rejects negative-stride views)
        self.color = np.ascontiguousarray(
            (np.asarray(rgb)[..., ::-1] * 255).astype(np.uint8)
        )
        return self.color


class RealSenseCamera(_BaseCamera):
    """Live Intel RealSense camera (RealSenseClass.py parity). Requires
    ``pyrealsense2``; raises at construction when no device is present."""

    def __init__(self, width: int = 640, height: int = 480, fps: int = 30):
        try:
            import pyrealsense2 as rs
        except ImportError as e:
            raise RuntimeError(
                "pyrealsense2 is not available; use ReplayCamera/SyntheticCamera"
            ) from e
        ctx = rs.context()
        if len(ctx.devices) == 0:
            raise RuntimeError("No Intel RealSense device connected.")
        self._rs = rs
        self.pipe = rs.pipeline()
        cfg = rs.config()
        cfg.enable_stream(rs.stream.depth, width, height, rs.format.z16, fps)
        cfg.enable_stream(rs.stream.color, width, height, rs.format.bgr8, fps)
        self.profile = self.pipe.start(cfg)
        self.align = rs.align(rs.stream.color)
        self.depth_scale = (
            self.profile.get_device().first_depth_sensor().get_depth_scale()
        )
        intr = (
            self.profile.get_stream(rs.stream.color)
            .as_video_stream_profile()
            .get_intrinsics()
        )
        self.intrinsics = g3.Intrinsics(
            fx=intr.fx, fy=intr.fy, cx=intr.ppx, cy=intr.ppy,
            width=intr.width, height=intr.height,
        )
        self._prev = None

    def get_rgbd(self):
        frameset = self.align.process(self.pipe.wait_for_frames())
        depth_frame = frameset.get_depth_frame()
        color_frame = frameset.get_color_frame()
        if not depth_frame or not color_frame:
            return None
        raw = np.asanyarray(depth_frame.get_data()).astype(np.float32) * self.depth_scale
        d = spatial_filter(jnp.asarray(raw))
        if self._prev is not None:
            d = temporal_filter(d, self._prev)
        self._prev = d
        self.depth = hole_filling_filter(d)
        self.color = np.asanyarray(color_frame.get_data())
        return self.color

    def stop(self) -> None:
        self.pipe.stop()
