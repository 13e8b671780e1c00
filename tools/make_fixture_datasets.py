"""Generate the tiny committed real-format fixture datasets (VERDICT r2 #10).

Writes `datasets/fixtures/{coco,kitti}/` in the REFERENCE on-disk layout
(`/root/reference/src/datasets/DataClasses.py:152-277`):

  images/<split>/*.jpg|png        deterministic drawn scenes
  labels/<split>/*.txt            YOLO boxes: `cls cx cy w h` (normalized)
  points/<split>/*.npz            keypoint pseudo-labels {'pts': (N, 2)}

so the loaders' real-data paths (directory globbing, label txt parsing, npz
points, letterbox vs crop, DontCare removal) are exercised by committed
files, not only by synthetic in-memory data. Scenes are drawn to MATCH their
labels: each box is a filled rectangle, each point a corner of a drawn cross,
so a trained model could in principle score > 0 on them.

Deterministic; re-running reproduces byte-identical npz/txt (images via cv2
PNG/JPEG encoders are stable for a given cv2 build).

  python tools/make_fixture_datasets.py
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
FIXTURES = ROOT / "datasets" / "fixtures"

# class table shared by both fixtures; index 2 exercises KITTI DontCare
NAMES = ["car", "person", "DontCare"]


def _draw_scene(rng, h, w, n_boxes, n_dontcare=0):
    """Image + (cls cx cy w h) labels + corner points, all consistent."""
    import cv2

    img = np.full((h, w, 3), 40, np.uint8)
    # textured background so keypoint NMS has something to chew on
    img += (rng.uniform(0, 25, (h, w, 3))).astype(np.uint8)
    boxes, points = [], []
    for i in range(n_boxes + n_dontcare):
        bw = int(rng.uniform(0.15, 0.3) * w)
        bh = int(rng.uniform(0.15, 0.3) * h)
        x0 = int(rng.uniform(2, w - bw - 2))
        y0 = int(rng.uniform(2, h - bh - 2))
        cls = int(rng.integers(0, 2)) if i < n_boxes else 2  # DontCare last
        color = [(90, 160, 240), (240, 160, 90), (128, 128, 128)][cls]
        cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh), color, -1)
        boxes.append([cls, (x0 + bw / 2) / w, (y0 + bh / 2) / h, bw / w, bh / h])
        # box corners are true interest points
        points += [[x0, y0], [x0 + bw, y0], [x0, y0 + bh], [x0 + bw, y0 + bh]]
    # a couple of crosses for standalone corners
    for _ in range(3):
        cx = int(rng.uniform(8, w - 8))
        cy = int(rng.uniform(8, h - 8))
        cv2.line(img, (cx - 5, cy), (cx + 5, cy), (255, 255, 255), 1)
        cv2.line(img, (cx, cy - 5), (cx, cy + 5), (255, 255, 255), 1)
        points.append([cx, cy])
    return img, np.asarray(boxes, np.float32), np.asarray(points, np.float32)


def _write_split(base: Path, split: str, sizes, seed: int, suffix: str,
                 with_dontcare: bool, with_points: bool = True):
    import cv2

    (base / "images" / split).mkdir(parents=True, exist_ok=True)
    (base / "labels" / split).mkdir(parents=True, exist_ok=True)
    if with_points:
        (base / "points" / split).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i, (h, w) in enumerate(sizes):
        img, boxes, points = _draw_scene(
            rng, h, w, n_boxes=int(rng.integers(1, 4)),
            n_dontcare=1 if (with_dontcare and i % 2 == 0) else 0,
        )
        name = f"{split}_{i:03d}"
        cv2.imwrite(str(base / "images" / split / f"{name}{suffix}"), img)
        lines = [" ".join(f"{v:.6f}" if j else str(int(v))
                          for j, v in enumerate(row)) for row in boxes]
        (base / "labels" / split / f"{name}.txt").write_text("\n".join(lines) + "\n")
        if with_points:
            np.savez_compressed(base / "points" / split / f"{name}.npz",
                                pts=points)


def main():
    # COCO-style: varied aspect ratios -> letterbox path
    coco = FIXTURES / "coco"
    _write_split(coco, "train",
                 [(96, 128), (120, 100), (80, 144), (128, 96), (104, 136)],
                 seed=11, suffix=".jpg", with_dontcare=False)
    _write_split(coco, "val", [(96, 128), (112, 112), (88, 120)],
                 seed=23, suffix=".jpg", with_dontcare=False)
    # KITTI-style: wide frames + DontCare regions -> crop path
    kitti = FIXTURES / "kitti"
    _write_split(kitti, "train",
                 [(96, 320), (96, 320), (112, 352), (96, 320)],
                 seed=37, suffix=".png", with_dontcare=True)
    _write_split(kitti, "val", [(96, 320), (96, 320)],
                 seed=53, suffix=".png", with_dontcare=True)
    n = len(list(FIXTURES.rglob("*.*")))
    print(f"[fixtures] wrote {n} files under {FIXTURES}")


if __name__ == "__main__":
    main()
