"""Synthetic scene generator: domain-randomized YOLO-seg datasets and
BOP-format scenes straight from CAD models.

TPU-native stand-in for step 1 of the reference workflow (README.md:1-16:
"synthetic data generation with BlenderProc" — upstream of the reference
repo, which only consumes its outputs). Where BlenderProc path-traces on a
GPU, this renders with the framework's own point-splat renderer in ONE fused
device program per scene: every instance (labeled objects + unlabeled
distractor clutter) is splatted into a shared z-buffer, so mutual occlusion
is exact and each instance's *visible* mask falls out of the per-pixel
winner. The host composes a procedural background, jitters photometrics, and
writes:

  - YOLO-seg labels (``cls x1 y1 x2 y2 ...`` normalized polygons — the format
    the reference trains on, detection/dataset.yaml:1-12 + testrun.py:21-28)
    with a ``dataset.yaml`` that ``detection/train.py`` consumes unchanged;
  - optionally a BOP scene (``scene_gt.json`` / ``scene_camera.json`` /
    ``rgb/`` / 16-bit ``depth/`` / ``mask_visib/`` — the layout
    ``tools/eval_bop.py`` and ``main_image.py`` evaluate against,
    utils/bop.py schema), giving a full synthetic pose-eval scene from
    nothing but a CAD file.

Randomization axes (the BlenderProc recipe's equivalents): camera-frame
object placement (uniform SO(3) rotation, distance vs object diagonal,
image-plane anchor), instance count, unlabeled distractor shapes
(ellipsoid/box clutter that occludes), per-instance base color, directional
light, procedural background (gradient + low-frequency blotches + shapes),
pixel noise, and brightness/contrast jitter.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom3d as g3
from ..render.mesh import TriangleMesh
from ..render.points import render_depth
from ..geom3d.se3 import transform_points


# ---------------------------------------------------------------------------
# fused scene program
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("intr",))
def _scene_parts(pts, nrm, valid, Ts, colors, light, intr):
    """Per-instance splat renders: (K, H, W) depth + (K, H, W, 3) rgb,
    PRE-merge (the shared-z-buffer merge happens in ``_scene_render`` /
    host-side ``_merge_instances`` for mixed-instrument scenes)."""
    H, W = intr.height, intr.width

    def one(p, n, va, T, col):
        d = render_depth(p, va, T, intr, near=0.01, far=10.0)
        cam = transform_points(T, p)
        z = cam[:, 2]
        ok = va & (z > 0.01) & (z < 10.0)
        zs = jnp.where(ok, z, 1.0)
        u = jnp.round(intr.fx * cam[:, 0] / zs + intr.cx).astype(jnp.int32)
        v = jnp.round(intr.fy * cam[:, 1] / zs + intr.cy).astype(jnp.int32)
        in_img = ok & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        flat = jnp.where(in_img, v * W + u, H * W)
        won = in_img & (
            z <= d.reshape(-1)[jnp.clip(flat, 0, H * W - 1)] + 1e-4
        )
        n_cam = n @ T[:3, :3].T
        # two-sided directional Lambertian + ambient floor: point normals from
        # area sampling can face either way on thin shells
        lam = jnp.clip(jnp.abs(jnp.sum(n_cam * light[None, :], axis=1)), 0.0, 1.0)
        shade = 0.25 + 0.75 * lam
        img = jnp.zeros((H * W + 1, 3))
        img = img.at[jnp.where(won, flat, H * W)].set(
            shade[:, None] * col[None, :], mode="drop"
        )
        return d, img[: H * W].reshape(H, W, 3)

    return jax.vmap(one)(pts, nrm, valid, Ts, colors)


@jax.jit
def _merge_jnp(ds, rgbs):
    dpos = jnp.where(ds > 0, ds, jnp.inf)
    win = jnp.argmin(dpos, axis=0)  # (H, W)
    combined = jnp.min(dpos, axis=0)
    covered = jnp.isfinite(combined)
    vis = covered[None] & (win[None] == jnp.arange(ds.shape[0])[:, None, None])
    rgb = jnp.take_along_axis(
        rgbs, win[None, :, :, None], axis=0
    )[0]
    rgb = jnp.where(covered[..., None], rgb, 0.0)
    depth = jnp.where(covered, combined, 0.0)
    return depth, rgb, vis


@partial(jax.jit, static_argnames=("intr",))
def _scene_render(pts, nrm, valid, Ts, colors, light, intr):
    """Render K instances into one scene with exact mutual occlusion.

    pts/nrm: (K, N, 3) model-frame surface samples; valid: (K, N) (False for
    unused instance slots); Ts: (K, 4, 4) model->camera; colors: (K, 3) base
    albedo; light: (3,) unit direction (camera frame) the light shines ALONG.

    Returns (depth (H, W) m, rgb (H, W, 3) float in [0, 1] with 0 background,
    vis (K, H, W) bool per-instance VISIBLE mask — the pixels the instance
    wins in the shared z-buffer).
    """
    ds, rgbs = _scene_parts(pts, nrm, valid, Ts, colors, light, intr)
    return _merge_jnp(ds, rgbs)


@partial(jax.jit, static_argnames=("intr",))
def _mesh_parts(verts, faces, slot_valid, Ts, colors, intr):
    """Per-instance EXACT triangle-raster renders (the BOP-scene depth
    instrument of ``depth_instrument='mesh'``): depth from the CAD's actual
    faces (render.raster, < 1 mm vs analytic closed forms), color shaded
    from depth gradients. verts (K, V, 3), faces (K, F, 3) padded to common
    capacities; invalid slots render empty."""
    from ..render.raster import depth_lambert, render_depth_mesh

    def one(v, f, ok, T, col):
        d = render_depth_mesh(v, f, T, intr, near=0.01, far=10.0)
        d = jnp.where(ok, d, 0.0)
        shade = 0.25 + 0.75 * depth_lambert(d, intr)
        rgb = jnp.where(
            (d > 0)[..., None], shade[..., None] * col[None, None, :], 0.0
        )
        return d, rgb

    return jax.vmap(one)(verts, faces, slot_valid, Ts, colors)


# ---------------------------------------------------------------------------
# randomization helpers (host-side numpy)
# ---------------------------------------------------------------------------


def _rand_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform SO(3) sample via normalized quaternion."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def _place_instance(rng, intr, diag, dist_range=(1.6, 3.2), margin=0.18):
    """Random model->camera pose: uniform rotation; anchor pixel drawn inside
    the image margins and back-projected at a diagonal-scaled distance."""
    z = float(diag * rng.uniform(*dist_range))
    u = rng.uniform(margin, 1.0 - margin) * intr.width
    v = rng.uniform(margin, 1.0 - margin) * intr.height
    t = np.array(
        [(u - intr.cx) / intr.fx * z, (v - intr.cy) / intr.fy * z, z], np.float32
    )
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = _rand_rotation(rng)
    T[:3, 3] = t
    return T


def _distractor_cloud(rng: np.random.Generator, n: int, scale: float):
    """Random clutter shape (ellipsoid or box shell) surface samples +
    outward normals, centered at the origin at ~``scale`` extent."""
    half = scale * rng.uniform(0.25, 0.6, size=3).astype(np.float32)
    if rng.random() < 0.5:  # ellipsoid
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        pts = d * half[None, :]
        nrm = pts / np.maximum(half[None, :] ** 2, 1e-9)  # gradient of the implicit
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    else:  # box shell: pick a face per point
        face = rng.integers(0, 6, size=n)
        uvw = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
        pts = uvw * half[None, :]
        nrm = np.zeros((n, 3), np.float32)
        ax, sgn = face // 2, np.where(face % 2 == 0, 1.0, -1.0).astype(np.float32)
        pts[np.arange(n), ax] = sgn * half[ax]
        nrm[np.arange(n), ax] = sgn
    return pts.astype(np.float32), nrm.astype(np.float32)


def _procedural_background(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """(H, W, 3) uint8: linear gradient + low-frequency blotches + a few flat
    shapes — the cheap stand-in for BlenderProc's randomized room/textures."""
    import cv2

    c0 = rng.uniform(20, 235, size=3)
    c1 = rng.uniform(20, 235, size=3)
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi)
    ramp = (gx * np.cos(theta) + gy * np.sin(theta))
    ramp = (ramp - ramp.min()) / max(float(np.ptp(ramp)), 1e-6)
    bg = c0[None, None, :] + ramp[..., None] * (c1 - c0)[None, None, :]
    # low-frequency blotches: tiny random grid upsampled
    grid = rng.uniform(-30, 30, size=(max(h // 40, 2), max(w // 40, 2), 3))
    blotch = cv2.resize(grid.astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC)
    bg = bg + blotch
    n_shapes = int(rng.integers(0, 6))
    for _ in range(n_shapes):
        col = rng.uniform(0, 255, size=3).tolist()
        if rng.random() < 0.5:
            p0 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            p1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.rectangle(bg, p0, p1, col, -1)
        else:
            c = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.circle(bg, c, int(rng.integers(4, max(min(h, w) // 4, 5))), col, -1)
    return np.clip(bg, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


@dataclass
class SynthConfig:
    cad: Sequence[str]  # "name=path.ply" or bare paths (stem becomes the name)
    out: str
    n_train: int = 64
    n_val: int = 16
    width: int = 640
    height: int = 480
    fov_deg: float = 60.0  # the template camera's FoV (template_creation.py:188-191)
    max_objects: int = 3  # labeled instances per scene (>=1)
    max_distractors: int = 2  # unlabeled occluders per scene
    points_per_object: int = 60_000  # splat density (hole-free at 640x480)
    min_visib_px: int = 64  # skip instances occluded below this
    dist_range: tuple = (1.6, 3.2)  # camera distance in object diagonals
    noise_sigma: float = 3.0  # additive pixel noise (uint8 units)
    bop: bool = False  # also write scene_gt/scene_camera/depth/mask_visib
    depth_scale: float = 1.0  # BOP depth_scale (depth png is mm/depth_scale)
    # "splat" (default, one fused program) or "mesh": labeled objects render
    # through the EXACT triangle raster (< 1 mm vs analytic depth) so BOP
    # depth/mask_visib artifacts carry no splat bias — the instrument for
    # renderer-independent eval scenes (distractor clutter stays splatted;
    # it is unlabeled and never scored)
    depth_instrument: str = "splat"
    seed: int = 0


@dataclass
class SynthObject:
    name: str
    points: np.ndarray  # (N, 3) float32, meters
    normals: np.ndarray
    diag: float
    cls: int
    # raster assets (depth_instrument="mesh"): decimated vertices/faces
    verts: np.ndarray | None = None
    faces: np.ndarray | None = None


def load_objects(cad_specs: Sequence[str], n_points: int, seed: int = 0):
    """Parse ``name=path`` (or bare path) CAD specs into sampled surface sets.
    mm-scale CADs auto-scale to meters like the rest of the framework
    (template_creation.py:155-160)."""
    rng = np.random.default_rng(seed)
    objs = []
    for i, spec in enumerate(cad_specs):
        if "=" in spec:
            name, path = spec.split("=", 1)
        else:
            path = spec
            name = os.path.splitext(os.path.basename(path))[0]
        mesh = TriangleMesh.load(path)
        if np.max(mesh.extent) >= 1.0:
            mesh = mesh.scale(0.001, center=np.zeros(3))
        pts, nrm = mesh.sample_points_uniformly(n_points, rng)
        from ..render.mesh import decimate_to_faces

        dec = decimate_to_faces(mesh, 4096)
        objs.append(
            SynthObject(
                name=name, points=pts, normals=nrm,
                diag=float(np.linalg.norm(mesh.extent)), cls=i,
                verts=np.asarray(dec.vertices, np.float32),
                faces=np.asarray(dec.faces, np.int32),
            )
        )
    return objs


def _write_yolo_label(path, entries):
    """entries: list of (cls, poly (K, 2) normalized)."""
    lines = []
    for cls, poly in entries:
        lines.append(
            f"{cls} " + " ".join(f"{v:.5f}" for v in np.asarray(poly).reshape(-1))
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def _visible_polygon(mask: np.ndarray, min_px: int) -> Optional[np.ndarray]:
    """Largest external contour of the visible mask, if it carries most of the
    visible area (heavily fragmented = too occluded to label cleanly)."""
    from ..models.yolo.masks import masks_to_polygons

    area = int(mask.sum())
    if area < min_px:
        return None
    polys = masks_to_polygons(mask)
    if not polys:
        return None
    import cv2

    largest = polys[0]
    if cv2.contourArea(largest) < 0.5 * area:
        return None
    return largest


def generate(cfg: SynthConfig, log=print) -> dict:
    """Generate the dataset. Returns a summary dict (paths + counts)."""
    import cv2

    objs = load_objects(cfg.cad, cfg.points_per_object, cfg.seed)
    intr = g3.Intrinsics.from_fov(cfg.fov_deg, cfg.width, cfg.height)
    rng = np.random.default_rng(cfg.seed)

    K = cfg.max_objects + cfg.max_distractors
    N = cfg.points_per_object
    # instance slot buffers reused across frames (fixed shapes -> one compile)
    pts = np.zeros((K, N, 3), np.float32)
    nrm = np.zeros((K, N, 3), np.float32)
    valid = np.zeros((K, N), bool)
    Ts = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    colors = np.zeros((K, 3), np.float32)

    use_mesh = cfg.depth_instrument == "mesh"
    if use_mesh:
        from ..render.mesh import pad_faces

        # common raster capacities across CADs: vertex padding repeats the
        # LAST vertex (np.pad mode="edge"); faces pad degenerate
        v_cap = max(len(o.verts) for o in objs)
        f_cap = -(-max(len(o.faces) for o in objs) // 256) * 256
        obj_verts = {
            o.cls: np.pad(o.verts, ((0, v_cap - len(o.verts)), (0, 0)),
                          mode="edge")
            for o in objs
        }
        obj_faces = {o.cls: pad_faces(o.faces, f_cap) for o in objs}
        Ko = cfg.max_objects
        vbuf = np.zeros((Ko, v_cap, 3), np.float32)
        fbuf = np.zeros((Ko, f_cap, 3), np.int32)
        slot_ok = np.zeros((Ko,), bool)

    summary = {"out": cfg.out, "classes": {o.cls: o.name for o in objs},
               "frames": {}, "skipped_instances": 0}
    bop_gt, bop_cam = {}, {}
    if cfg.bop:
        for d in ("rgb", "depth", "mask_visib"):
            os.makedirs(os.path.join(cfg.out, d), exist_ok=True)

    frame_id = 0
    for split, n_frames in (("train", cfg.n_train), ("val", cfg.n_val)):
        img_dir = os.path.join(cfg.out, split, "images")
        lbl_dir = os.path.join(cfg.out, split, "labels")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        written = 0
        for _ in range(n_frames):
            n_obj = int(rng.integers(1, cfg.max_objects + 1))
            n_dis = int(rng.integers(0, cfg.max_distractors + 1))
            valid[:] = False
            cls_of_slot = [-1] * K
            mean_diag = float(np.mean([o.diag for o in objs]))
            if use_mesh:
                slot_ok[:] = False
            for k in range(n_obj):
                o = objs[int(rng.integers(0, len(objs)))]
                pts[k], nrm[k] = o.points, o.normals
                valid[k] = True
                Ts[k] = _place_instance(rng, intr, o.diag, cfg.dist_range)
                colors[k] = rng.uniform(0.15, 1.0, size=3)
                cls_of_slot[k] = o.cls
                if use_mesh:
                    vbuf[k] = obj_verts[o.cls]
                    fbuf[k] = obj_faces[o.cls]
                    slot_ok[k] = True
            for k in range(cfg.max_objects, cfg.max_objects + n_dis):
                dp, dn = _distractor_cloud(rng, N, mean_diag)
                pts[k], nrm[k] = dp, dn
                valid[k] = True
                # distractors sit in the same depth band so they can occlude
                Ts[k] = _place_instance(rng, intr, mean_diag, cfg.dist_range)
                colors[k] = rng.uniform(0.15, 1.0, size=3)
            light = rng.normal(size=3)
            light[2] = abs(light[2]) + 0.5  # bias along the view direction
            light /= np.linalg.norm(light)

            if use_mesh:
                # labeled objects through the exact raster; distractor slots
                # stay splatted (unlabeled clutter, never scored); shared
                # z-buffer merge over the concatenated per-instance stacks
                Ko = cfg.max_objects
                ds_o, rgb_o = _mesh_parts(
                    jnp.asarray(vbuf), jnp.asarray(fbuf), jnp.asarray(slot_ok),
                    jnp.asarray(Ts[:Ko]), jnp.asarray(colors[:Ko]), intr,
                )
                ds_d, rgb_d = _scene_parts(
                    jnp.asarray(pts[Ko:]), jnp.asarray(nrm[Ko:]),
                    jnp.asarray(valid[Ko:]), jnp.asarray(Ts[Ko:]),
                    jnp.asarray(colors[Ko:]),
                    jnp.asarray(light, jnp.float32), intr,
                )
                depth, rgb, vis = _merge_jnp(
                    jnp.concatenate([ds_o, ds_d]),
                    jnp.concatenate([rgb_o, rgb_d]),
                )
            else:
                depth, rgb, vis = _scene_render(
                    jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(valid),
                    jnp.asarray(Ts), jnp.asarray(colors),
                    jnp.asarray(light, jnp.float32), intr,
                )
            depth = np.asarray(depth)
            rgb = np.asarray(rgb)
            vis = np.asarray(vis)

            bg = _procedural_background(rng, cfg.height, cfg.width)
            covered = depth > 0
            img = np.where(covered[..., None], rgb * 255.0, bg.astype(np.float32))
            if cfg.noise_sigma > 0:
                img = img + rng.normal(0, cfg.noise_sigma, img.shape)
            gain = rng.uniform(0.85, 1.15)
            img = np.clip(img * gain, 0, 255).astype(np.uint8)
            img_bgr = np.ascontiguousarray(img[..., ::-1])

            entries, gt_entries, inst_masks = [], [], []
            for k in range(n_obj):
                poly = _visible_polygon(vis[k], cfg.min_visib_px)
                if poly is None:
                    summary["skipped_instances"] += 1
                    continue
                p = poly.astype(np.float32)
                p[:, 0] /= cfg.width
                p[:, 1] /= cfg.height
                entries.append((cls_of_slot[k], np.clip(p, 0.0, 1.0)))
                gt_entries.append(
                    {
                        "cam_R_m2c": Ts[k][:3, :3].reshape(-1).tolist(),
                        "cam_t_m2c": (Ts[k][:3, 3] * 1000.0).tolist(),  # mm
                        "obj_id": cls_of_slot[k] + 1,
                    }
                )
                inst_masks.append(vis[k])
            if not entries:
                continue  # fully occluded draw; try next frame slot

            stem = f"{frame_id:06d}"
            cv2.imwrite(os.path.join(img_dir, f"{stem}.jpg"), img_bgr)
            _write_yolo_label(os.path.join(lbl_dir, f"{stem}.txt"), entries)
            if cfg.bop:
                cv2.imwrite(os.path.join(cfg.out, "rgb", f"{stem}.png"), img_bgr)
                d16 = np.clip(
                    depth * 1000.0 / cfg.depth_scale, 0, 65535
                ).astype(np.uint16)
                cv2.imwrite(os.path.join(cfg.out, "depth", f"{stem}.png"), d16)
                for j, m in enumerate(inst_masks):
                    cv2.imwrite(
                        os.path.join(cfg.out, "mask_visib", f"{stem}_{j:06d}.png"),
                        m.astype(np.uint8) * 255,
                    )
                bop_gt[str(frame_id)] = gt_entries
                bop_cam[str(frame_id)] = {
                    "cam_K": [intr.fx, 0.0, intr.cx, 0.0, intr.fy, intr.cy,
                              0.0, 0.0, 1.0],
                    "depth_scale": cfg.depth_scale,
                }
            written += 1
            frame_id += 1
        summary["frames"][split] = written
        log(f"{split}: {written} frames -> {img_dir}")

    yml = os.path.join(cfg.out, "dataset.yaml")
    with open(yml, "w") as f:
        f.write(f"path: {cfg.out}\ntrain: train\nval: val\nnames:\n")
        for o in objs:
            f.write(f'    {o.cls}: "{o.name}"\n')
    summary["dataset_yaml"] = yml
    if cfg.bop:
        with open(os.path.join(cfg.out, "scene_gt.json"), "w") as f:
            json.dump(bop_gt, f)
        with open(os.path.join(cfg.out, "scene_camera.json"), "w") as f:
            json.dump(bop_cam, f)
        summary["scene_gt"] = os.path.join(cfg.out, "scene_gt.json")
    return summary
