"""Single-image YOLO prediction check — drop-in for reference
detection/predict.py: load trained weights, run one image at imgsz=640
conf=0.8, display (or save) the annotated result.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from poseestimator_tpu.pipeline import Detector


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default="./data/best.pt")
    p.add_argument("--image", default=None)
    p.add_argument("--folder", default=None,
                   help="batch inference over every image in a folder")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.8)
    p.add_argument("--nc", type=int, default=5)
    p.add_argument("--show", action="store_true")
    p.add_argument("--save", default=None, help="write annotated image here")
    args = p.parse_args(argv)

    import cv2

    if args.folder:
        import glob
        import time

        import numpy as np

        det = Detector(args.weights, nc=args.nc)
        files = sorted(
            f for f in glob.glob(os.path.join(args.folder, "*"))
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )
        if not files:
            raise SystemExit(f"no images in {args.folder}")
        imgs = [cv2.imread(f) for f in files]
        h, w = imgs[0].shape[:2]
        t0 = time.time()
        n_total = 0
        B = args.batch
        for i in range(0, len(imgs), B):
            chunk = imgs[i : i + B]
            while len(chunk) < B:  # pad the tail batch (static shapes)
                chunk.append(np.zeros_like(chunk[0]))
            dets, boxes = det.predict_batch(np.stack(chunk), conf=args.conf)
            counts = np.asarray(dets.valid.sum(axis=1))
            for j, f in enumerate(files[i : i + B]):
                print(f"{f}: {int(counts[j])} detections")
                n_total += int(counts[j])
        dt = time.time() - t0
        print(f"{len(files)} images in {dt:.2f}s ({len(files)/dt:.1f} img/s), "
              f"{n_total} detections")
        return 0

    img = cv2.imread(args.image)
    if img is None:
        raise FileNotFoundError(f"Image not found at {args.image}")
    det = Detector(args.weights, nc=args.nc)
    results = det.detect_mask(img, conf=args.conf)
    print(f"{len(results)} detections")
    vis = img.copy()
    rng = np.random.default_rng(0)
    for r in results:
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        m = r["mask"] > 0
        vis[m] = (0.5 * vis[m] + 0.5 * np.asarray(color)).astype(np.uint8)
        x1, y1, x2, y2 = [int(v) for v in r["bbox"]]
        cv2.rectangle(vis, (x1, y1), (x2, y2), color, 2)
        cv2.putText(vis, f"{r['class_id']}:{r['conf']:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    if args.save:
        cv2.imwrite(args.save, vis)
    if args.show:
        cv2.imshow("prediction", vis)
        cv2.waitKey(0)
        cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
