"""YOLO-seg label visualizer — drop-in for reference detection/testrun.py:
draw the normalized polygon labels over the image to validate annotations.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def draw_yolo_polygons(image_path, label_path, class_filter=None, show=True, save=None):
    import cv2

    image = cv2.imread(image_path)
    if image is None:
        raise ValueError(f"Could not read image: {image_path}")
    h, w = image.shape[:2]

    from poseestimator_tpu.training import parse_label_file

    for class_id, poly in parse_label_file(label_path):
        if class_filter is not None and class_id != class_filter:
            continue
        pts = np.stack([poly[:, 0] * w, poly[:, 1] * h], axis=1)
        contour = np.round(pts).astype(np.int32).reshape(-1, 1, 2)
        cv2.polylines(image, [contour], isClosed=True, color=(0, 255, 0), thickness=2)
        cv2.fillPoly(image, [contour], color=(0, 255, 0))
    if save:
        cv2.imwrite(save, image)
    if show:
        cv2.imshow("Polygon Overlay", image)
        cv2.waitKey(0)
        cv2.destroyAllWindows()
    return image


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--label", required=True)
    p.add_argument("--class-id", type=int, default=None)
    p.add_argument("--save", default=None)
    p.add_argument("--headless", action="store_true")
    args = p.parse_args(argv)
    draw_yolo_polygons(args.image, args.label, args.class_id,
                       show=not args.headless, save=args.save)
    return 0


if __name__ == "__main__":
    sys.exit(main())
