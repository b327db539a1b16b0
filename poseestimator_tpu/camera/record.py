"""Record a camera stream into the replay format.

Produces the directory layout ``apps.main_realsense --source replay:<dir>``
consumes: ``color_{i:05d}.png`` + ``depth_{i:05d}.npy`` (float32 meters) +
``intrinsics.npy`` ([K, width, height]). Lets a live RealSense session be
captured once and replayed headlessly forever (the test/CI strategy of
SURVEY.md section 4).
"""
from __future__ import annotations

import os

import numpy as np


def record(camera, out_dir: str, n_frames: int = 300, verbose: bool = True) -> int:
    """Pull ``n_frames`` from any CameraSource and write the replay dir.

    Returns the number of frames written (stops early if the source ends).
    """
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    intr = camera.intrinsics
    np.save(
        os.path.join(out_dir, "intrinsics.npy"),
        np.array([intr.K, intr.width, intr.height], dtype=object),
        allow_pickle=True,
    )
    i = 0
    for i in range(n_frames):
        color = camera.get_rgbd()
        if color is None:
            break
        cv2.imwrite(os.path.join(out_dir, f"color_{i:05d}.png"), color)
        np.save(
            os.path.join(out_dir, f"depth_{i:05d}.npy"),
            np.asarray(camera.depth, np.float32),
        )
        if verbose and i % 30 == 0:
            print(f"recorded {i} frames")
    else:
        i = n_frames - 1
        return n_frames
    return i


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=300)
    args = p.parse_args(argv)
    from .source import RealSenseCamera

    cam = RealSenseCamera()
    try:
        n = record(cam, args.out, args.frames)
        print(f"wrote {n} frames to {args.out}")
    finally:
        cam.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
