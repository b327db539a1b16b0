"""Synthetic scene generator (training/synth.py + detection/generate.py).

The framework-native stand-in for the reference workflow's BlenderProc step
(reference README.md:1-16, step 1): occlusion-correct multi-instance scene
rendering, YOLO-seg label emission (detection/dataset.yaml schema), and
BOP-format scene output consumable by the pose-eval tools."""
import json
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import box_mesh, l_shape_mesh, write_mesh

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.training.synth import (
    SynthConfig,
    _scene_render,
    generate,
    load_objects,
)


def _tiny_cads(tmp_path):
    a = tmp_path / "boxy.ply"
    b = tmp_path / "ell.ply"
    write_mesh(a, box_mesh(0.12, 0.07, 0.05))
    write_mesh(b, l_shape_mesh(0.2))
    return [f"boxy={a}", f"ell={b}"]


def test_scene_render_occlusion():
    """Two instances on the same line of sight: the front one wins the shared
    z-buffer; the back one's VISIBLE mask excludes the overlap."""
    intr = g3.Intrinsics.from_fov(60.0, 128, 96)
    rng = np.random.default_rng(0)
    pts, nrm = box_mesh(0.1, 0.1, 0.02).sample_points_uniformly(6000, rng)
    P = jnp.stack([jnp.asarray(pts)] * 2)
    Nn = jnp.stack([jnp.asarray(nrm)] * 2)
    V = jnp.ones((2, 6000), bool)
    T_front = jnp.eye(4).at[2, 3].set(0.5)
    T_back = jnp.eye(4).at[2, 3].set(0.8)
    Ts = jnp.stack([T_front, T_back])
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    light = jnp.asarray([0.0, 0.0, 1.0])
    depth, rgb, vis = _scene_render(P, Nn, V, Ts, colors, light, intr)
    depth, vis = np.asarray(depth), np.asarray(vis)
    assert vis[0].sum() > 200  # front instance fully visible
    assert not np.any(vis[0] & vis[1])  # winner masks are disjoint
    # the back slab is larger on screen only via its un-occluded fringe; at
    # the overlap the combined depth equals the FRONT depth
    overlap = vis[0] & (depth > 0)
    assert np.all(depth[overlap] < 0.6)
    # unused slot contributes nothing
    V0 = V.at[1].set(False)
    d2, _, vis2 = _scene_render(P, Nn, V0, Ts, colors, light, intr)
    assert np.asarray(vis2)[1].sum() == 0


def test_generate_yolo_dataset(tmp_path):
    from poseestimator_tpu.training.data import (
        DataLoader,
        list_samples,
        load_dataset_yaml,
        parse_label_file,
    )

    cfg = SynthConfig(
        cad=_tiny_cads(tmp_path), out=str(tmp_path / "ds"),
        n_train=3, n_val=2, width=160, height=120, max_objects=2,
        max_distractors=1, points_per_object=8000, min_visib_px=24,
        seed=3,
    )
    summary = generate(cfg, log=lambda *a: None)
    assert summary["frames"]["train"] >= 2
    assert summary["frames"]["val"] >= 1

    spec = load_dataset_yaml(summary["dataset_yaml"])
    assert spec.names == {0: "boxy", 1: "ell"}
    samples = list_samples(spec, "train")
    assert len(samples) == summary["frames"]["train"]
    n_inst = 0
    for img_path, lbl_path in samples:
        assert os.path.exists(img_path)
        for cls, poly in parse_label_file(lbl_path):
            assert cls in (0, 1)
            assert poly.shape[1] == 2 and len(poly) >= 3
            assert float(poly.min()) >= 0.0 and float(poly.max()) <= 1.0
            n_inst += 1
    assert n_inst >= summary["frames"]["train"]  # >= one instance per frame

    # the emitted dataset feeds the product DataLoader end-to-end
    dl = DataLoader(samples, batch_size=2, imgsz=160,
                    augment=False, workers=0, max_instances=4)
    batch = next(iter(dl))
    assert batch.images.shape[0] == 2
    assert batch.masks.any(), "rasterized polygon masks must be non-empty"


def test_generate_bop_scene(tmp_path):
    """--bop output parses with the BOP utilities and is geometrically
    consistent: the masked back-projected depth lies ON the model surface
    transformed by the recorded GT pose."""
    from poseestimator_tpu.utils import bop

    out = tmp_path / "scene"
    cfg = SynthConfig(
        cad=_tiny_cads(tmp_path), out=str(out), n_train=2, n_val=1,
        width=160, height=120, max_objects=1, max_distractors=0,
        points_per_object=8000, min_visib_px=24, noise_sigma=0.0,
        bop=True, seed=5,
    )
    generate(cfg, log=lambda *a: None)
    gt_path, cam_path = str(out / "scene_gt.json"), str(out / "scene_camera.json")
    with open(gt_path) as f:
        gt = json.load(f)
    assert len(gt) >= 2
    frame = sorted(gt, key=int)[0]
    stem = f"{int(frame):06d}"
    T, obj_id = bop.load_scene_gt(gt_path, frame_key=frame)
    T[:3, 3] /= 1000.0  # scene_gt translation is mm (BOP convention)
    assert obj_id in (1, 2)
    intr, depth_scale, _ = bop.load_camera_intrinsics(cam_path, frame, 160, 120)
    assert depth_scale == 1.0

    import cv2

    mask = cv2.imread(str(out / "mask_visib" / f"{stem}_000000.png"),
                      cv2.IMREAD_UNCHANGED)
    assert mask is not None and (mask > 0).sum() >= 24
    cloud, _ = bop.get_pointcloud(
        str(out / "depth" / f"{stem}.png"), str(out / "rgb" / f"{stem}.png"),
        cam_path, mask, frame_id=frame,  # 255-valued visib mask (BOP files)
    )
    objs = load_objects(cfg.cad, 8000, cfg.seed)
    model = objs[obj_id - 1].points
    model_cam = (T[:3, :3] @ model.T).T + T[:3, 3]
    obs = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    d = np.linalg.norm(obs[:, None, :] - model_cam[None, ::7, :], axis=2).min(1)
    # splat quantization + 8k-sample surface gaps: a few mm, not cm
    assert float(np.median(d)) < 0.01, float(np.median(d))


def test_generate_cli(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "detection"))
    import generate as gen_cli

    a = tmp_path / "thing.ply"
    write_mesh(a, box_mesh(0.1, 0.06, 0.04))
    out = tmp_path / "cli_ds"
    rc = gen_cli.main([
        "--cad", str(a), "--out", str(out), "--train", "2", "--val", "1",
        "--imgsz", "128x96", "--max-objects", "1", "--max-distractors", "1",
        "--points", "6000", "--min-visib-px", "16", "--cpu", "--seed", "1",
    ])
    assert rc == 0
    assert (out / "dataset.yaml").exists()
    with open(out / "dataset.yaml") as f:
        txt = f.read()
    assert ' 0: "thing"' in txt


def test_generate_bop_scene_mesh_instrument(tmp_path):
    """depth_instrument="mesh" (round 4): BOP depth comes from the exact
    triangle raster — the masked back-projected cloud must sit ON the posed
    CAD surface markedly tighter than the splat's quantization allows."""
    from poseestimator_tpu.utils import bop

    out = tmp_path / "scene_m"
    cfg = SynthConfig(
        cad=_tiny_cads(tmp_path), out=str(out), n_train=2, n_val=1,
        width=160, height=120, max_objects=1, max_distractors=1,
        points_per_object=8000, min_visib_px=24, noise_sigma=0.0,
        bop=True, depth_instrument="mesh", seed=5,
    )
    generate(cfg, log=lambda *a: None)
    gt_path = str(out / "scene_gt.json")
    cam_path = str(out / "scene_camera.json")
    with open(gt_path) as f:
        gt = json.load(f)
    frame = sorted(gt, key=int)[0]
    stem = f"{int(frame):06d}"
    T, obj_id = bop.load_scene_gt(gt_path, frame_key=frame)
    T[:3, 3] /= 1000.0

    import cv2

    mask = cv2.imread(str(out / "mask_visib" / f"{stem}_000000.png"),
                      cv2.IMREAD_UNCHANGED)
    assert mask is not None and (mask > 0).sum() >= 24
    cloud, _ = bop.get_pointcloud(
        str(out / "depth" / f"{stem}.png"), str(out / "rgb" / f"{stem}.png"),
        cam_path, mask, frame_id=frame,
    )
    objs = load_objects(cfg.cad, 8000, cfg.seed)
    o = objs[obj_id - 1]
    # exact instrument -> compare against the DECIMATED raster mesh's dense
    # surface sampling (the instrument's own geometry)
    from poseestimator_tpu.render.mesh import TriangleMesh

    dense, _ = TriangleMesh(vertices=o.verts, faces=o.faces).sample_points_uniformly(
        20000, np.random.default_rng(0)
    )
    model_cam = (T[:3, :3] @ dense.T).T + T[:3, 3]
    obs = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    d = np.linalg.norm(obs[:, None, :] - model_cam[None, ::5, :], axis=2).min(1)
    # raster depth is exact; residual = depth-png mm quantization (<=0.5 mm)
    # + surface-sampling gaps — well under the splat's ~5-10 mm
    assert float(np.median(d)) < 0.004, float(np.median(d))
