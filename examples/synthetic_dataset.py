"""Generate a synthetic caption dataset with learnable image-text structure.

Stand-in for COCO/Flickr in an egress-free environment (BASELINE.md "real-
data quality parity" gap): images are procedurally drawn scenes whose
captions truthfully describe them (color / shape / position / background),
so a CLIP model trained on the output exhibits real retrieval recall and
zero-shot transfer — the full reference eval battery (inference.py:13-56,
CIFAR.ipynb protocol) runs meaningfully end to end.

Layout produced (the reference's Flickr8k shape, main.py:20-31):

  out/
    images/<name>.jpg                 train+valid pool, captions.csv rows
    captions.csv                      image,caption (2 captions per image)
    zeroshot/<shape>/*.jpg            class-per-subdir tree for zero-shot /
                                      linear-probe eval (held-out draws)

Usage:
  python examples/synthetic_dataset.py --out /tmp/synth --n-images 4096 \
      --n-zeroshot-per-class 32 --size 224
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

COLORS = {
    "red": (220, 40, 40), "green": (40, 190, 60), "blue": (40, 70, 220),
    "yellow": (230, 220, 50), "purple": (150, 60, 200),
    "orange": (240, 140, 30), "pink": (240, 120, 180),
    "cyan": (60, 210, 220), "brown": (140, 90, 40), "gray": (128, 128, 128),
}
SHAPES = ["circle", "square", "triangle", "ring", "cross", "diamond"]
BACKGROUNDS = {"white": 245, "black": 20, "light": 200, "dark": 70}
POSITIONS = ["top left", "top right", "bottom left", "bottom right",
             "center"]


def _center(size: int, pos: str, rng) -> tuple:
    q = size // 4
    jitter = lambda: int(rng.integers(-q // 3, q // 3 + 1))
    base = {
        "top left": (q, q), "top right": (3 * q, q),
        "bottom left": (q, 3 * q), "bottom right": (3 * q, 3 * q),
        "center": (2 * q, 2 * q),
    }[pos]
    return base[0] + jitter(), base[1] + jitter()


def draw_scene(size: int, color: str, shape: str, bg: str, pos: str,
               rng) -> np.ndarray:
    """Render one scene as RGB uint8 HWC with mild noise."""
    import cv2

    img = np.full((size, size, 3), BACKGROUNDS[bg], np.uint8)
    c = COLORS[color]
    cx, cy = _center(size, pos, rng)
    r = int(size * float(rng.uniform(0.10, 0.16)))
    if shape == "circle":
        cv2.circle(img, (cx, cy), r, c, -1)
    elif shape == "ring":
        cv2.circle(img, (cx, cy), r, c, max(2, r // 3))
    elif shape == "square":
        cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), c, -1)
    elif shape == "triangle":
        pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]])
        cv2.fillPoly(img, [pts], c)
    elif shape == "cross":
        w = max(2, r // 2)
        cv2.rectangle(img, (cx - r, cy - w), (cx + r, cy + w), c, -1)
        cv2.rectangle(img, (cx - w, cy - r), (cx + w, cy + r), c, -1)
    elif shape == "diamond":
        pts = np.array([[cx, cy - r], [cx - r, cy], [cx, cy + r],
                        [cx + r, cy]])
        cv2.fillPoly(img, [pts], c)
    noise = rng.integers(-10, 11, size=img.shape).astype(np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def captions_for(color: str, shape: str, bg: str, pos: str, rng) -> list:
    """Two truthful captions per image, varied phrasing."""
    templates = [
        f"a {color} {shape} on a {bg} background",
        f"the {color} {shape} is in the {pos}",
        f"a photo of a {color} {shape}",
        f"a {shape} colored {color} near the {pos}",
    ]
    idx = rng.choice(len(templates), size=2, replace=False)
    return [templates[i] for i in idx]


def main() -> None:
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-images", type=int, default=4096)
    p.add_argument("--n-zeroshot-per-class", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)

    rows = []
    color_names = list(COLORS)
    bg_names = list(BACKGROUNDS)
    for i in range(args.n_images):
        color = color_names[int(rng.integers(len(color_names)))]
        shape = SHAPES[int(rng.integers(len(SHAPES)))]
        bg = bg_names[int(rng.integers(len(bg_names)))]
        pos = POSITIONS[int(rng.integers(len(POSITIONS)))]
        name = f"img_{i:06d}.jpg"
        img = draw_scene(args.size, color, shape, bg, pos, rng)
        cv2.imwrite(os.path.join(img_dir, name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        for cap in captions_for(color, shape, bg, pos, rng):
            rows.append((i, name, cap))

    # id = per-image integer shared by its captions — the column the
    # reference's image-level train/valid split keys on (main.py:20-31).
    with open(os.path.join(args.out, "captions.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["id", "image", "caption"])
        w.writerows(rows)

    # Held-out class-per-subdirectory tree (class = shape) for zero-shot /
    # linear-probe eval, fresh draws not present in the training pool.
    for shape in SHAPES:
        sdir = os.path.join(args.out, "zeroshot", shape)
        os.makedirs(sdir, exist_ok=True)
        for j in range(args.n_zeroshot_per_class):
            color = color_names[int(rng.integers(len(color_names)))]
            bg = bg_names[int(rng.integers(len(bg_names)))]
            pos = POSITIONS[int(rng.integers(len(POSITIONS)))]
            img = draw_scene(args.size, color, shape, bg, pos, rng)
            cv2.imwrite(os.path.join(sdir, f"{shape}_{j:04d}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    print(f"wrote {args.n_images} images / {len(rows)} captions to "
          f"{args.out} (+ zeroshot tree: {len(SHAPES)} classes x "
          f"{args.n_zeroshot_per_class})")


if __name__ == "__main__":
    main()
