"""Label mirroring augmentation — drop-in for reference detection/mirror.py:
180-degree-rotate images and flip the normalized polygon coordinates
(1-x, 1-y) into new image + label directories.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def flip_coords(coords, flip_type):
    """(x, y, x, y, ...) normalized -> flipped (mirror.py:13-26 parity)."""
    out = []
    for i, val in enumerate(coords):
        if i % 2 == 0:  # x
            out.append(1 - val if flip_type in ("h", "hv") else val)
        else:  # y
            out.append(1 - val if flip_type in ("v", "hv") else val)
    return out


def mirror_dataset(image_dir, label_dir, out_image_dir, out_label_dir, flip_type="hv"):
    from PIL import Image

    os.makedirs(out_image_dir, exist_ok=True)
    os.makedirs(out_label_dir, exist_ok=True)
    ops = {
        "h": Image.FLIP_LEFT_RIGHT,
        "v": Image.FLIP_TOP_BOTTOM,
        "hv": Image.ROTATE_180,
    }
    n = 0
    for filename in sorted(os.listdir(image_dir)):
        if not filename.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        stem = os.path.splitext(filename)[0]
        label_path = os.path.join(label_dir, stem + ".txt")
        if not os.path.exists(label_path):
            print(f"Warning: No label for {filename}")
            continue
        img = Image.open(os.path.join(image_dir, filename))
        img.transpose(ops[flip_type]).save(os.path.join(out_image_dir, filename))

        lines_out = []
        with open(label_path) as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                cls = parts[0]
                coords = flip_coords([float(v) for v in parts[1:]], flip_type)
                lines_out.append(cls + " " + " ".join(f"{c:.6f}" for c in coords))
        with open(os.path.join(out_label_dir, stem + ".txt"), "w") as f:
            f.write("\n".join(lines_out))
        n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--label-dir", required=True)
    p.add_argument("--out-image-dir", required=True)
    p.add_argument("--out-label-dir", required=True)
    p.add_argument("--flip", default="hv", choices=["h", "v", "hv"])
    args = p.parse_args(argv)
    n = mirror_dataset(args.image_dir, args.label_dir, args.out_image_dir,
                       args.out_label_dir, args.flip)
    print(f"mirrored {n} samples")
    return 0


if __name__ == "__main__":
    sys.exit(main())
