"""Render a synthetic HPatches-layout benchmark set (the real HPatches
sequences are not present in this image and there is no network egress).

Layout matches what `yolopoint_tpu.data.datasets.HPatches` — and the
reference's loader (`/root/reference/src/datasets/DataClasses.py:888-1012`)
— consume: `<root>/{i,v}_<scene>/{1..6}.ppm` plus ground-truth `H_1_n`
files.  Viewpoint (`v_`) scenes warp one synthetic-shapes scene by sampled
homographies (the scene is rendered at 2x resolution and viewed through a
centered window so warps never expose out-of-frame content); illumination
(`i_`) scenes keep H = identity and vary brightness / contrast / noise /
shading, like the real i-sequences.

  python tools/make_synthetic_hpatches.py --out datasets/hpatches_synth \
      [--scenes 16 --i-scenes 8 --hw 240 320 --seed 3]

Evaluate trained weights on it with the HPatches-protocol CLI:

  python -m yolopoint_tpu.evaluation.hpatches_runner \
      --data datasets/hpatches_synth --weights runs/<run>/best
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _translate(tx: float, ty: float) -> np.ndarray:
    T = np.eye(3)
    T[0, 2], T[1, 2] = tx, ty
    return T


def _photometric(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Host-side illumination change: gain/bias + mild noise + corner shade
    gradient (numpy twin of the i-sequence appearance changes)."""
    out = img.astype(np.float32)
    out = out * rng.uniform(0.6, 1.4) + rng.uniform(-40, 40)
    # smooth directional shade (lighting gradient)
    H, W = img.shape[:2]
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    ramp = (np.cos(ang) * xx / W + np.sin(ang) * yy / H)
    out = out * (1.0 + rng.uniform(-0.25, 0.25) * ramp)[..., None]
    out = out + rng.normal(0, rng.uniform(0, 6), out.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def make_scene(rng: np.random.Generator, H: int, W: int, viewpoint: bool,
               n_views: int = 6):
    """Returns (list of n_views u8 HxWx3 images, list of 3x3 H_1_n)."""
    import cv2

    from yolopoint_tpu.data.synthetic import render_sample
    from yolopoint_tpu.ops.homography import sample_homography_np

    # 2x canvas assembled as a 2x2 mosaic of NATIVE-scale renders: shape
    # sizes in every (H, W) window match the training distribution (a single
    # 2H x 2W render draws 2x-scale shapes, which a single-scale
    # MagicPoint-style detector simply does not fire on). Each tile overlays
    # several primitives so every view has HPatches-like keypoint density
    # (~50-150 detections; the protocol never uses corner labels, so shape
    # intersections creating extra corners is fine).
    from yolopoint_tpu.data.synthetic import PRIMITIVES

    draw_fns = dict(PRIMITIVES)
    big = np.empty((2 * H, 2 * W), np.uint8)
    for ty in (0, 1):
        for tx in (0, 1):
            tile, _, _ = render_sample(rng, H, W, None, blur_prob=0.0)
            names = rng.choice([n for n, _ in PRIMITIVES], size=2, replace=False)
            for name in names:
                draw_fns[str(name)](rng, tile)
            if rng.random() < 0.3:
                import cv2 as _cv2
                tile = _cv2.GaussianBlur(tile, (3, 3), 0)
            big[ty * H:(ty + 1) * H, tx * W:(tx + 1) * W] = tile
    big3 = np.repeat(big[..., None], 3, axis=2)
    cy, cx = H // 2, W // 2
    img1 = big3[cy:cy + H, cx:cx + W].copy()
    views, homs = [img1], [np.eye(3)]
    for _ in range(n_views - 1):
        if viewpoint:
            # A maps warped-frame pixels -> img1-frame pixels (the sampler's
            # output->input convention); H_1_n = A^{-1}
            A = sample_homography_np(
                (H, W), perspective=True, scaling=True, rotation=True,
                translation=True, patch_ratio=0.85,
                perspective_amplitude_x=0.15, perspective_amplitude_y=0.15,
                scaling_amplitude=0.15, max_angle=0.6,
                seed=int(rng.integers(2**31)),
            )
            A = np.asarray(A, np.float64)
            # img_n(q) = img1(A q) = big(A q + c): warpPerspective computes
            # dst(q) = src(M^{-1} q) -> M = (T_c  A)^{-1}
            M = np.linalg.inv(_translate(cx, cy) @ A)
            img_n = cv2.warpPerspective(
                big3, M, (W, H), flags=cv2.INTER_LINEAR)
            H_1_n = np.linalg.inv(A)
            H_1_n /= H_1_n[2, 2]
        else:
            img_n = _photometric(rng, img1)
            H_1_n = np.eye(3)
        views.append(img_n)
        homs.append(H_1_n)
    return views, homs


def main(argv=None):
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/hpatches_synth")
    ap.add_argument("--scenes", type=int, default=16, help="viewpoint scenes")
    ap.add_argument("--i-scenes", type=int, default=8, help="illumination scenes")
    ap.add_argument("--hw", type=int, nargs=2, default=[240, 320])
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args(argv)

    H, W = args.hw
    root = Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    jobs = [("v", i) for i in range(args.scenes)] + \
           [("i", i) for i in range(args.i_scenes)]
    for kind, i in jobs:
        scene = root / f"{kind}_synth{i:03d}"
        scene.mkdir(exist_ok=True)
        views, homs = make_scene(rng, H, W, viewpoint=(kind == "v"))
        for n, (img, Hm) in enumerate(zip(views, homs), start=1):
            cv2.imwrite(str(scene / f"{n}.ppm"), img)
            if n > 1:
                (scene / f"H_1_{n}").write_text(
                    "\n".join(" ".join(f"{v:.10g}" for v in row) for row in Hm)
                )
    print(f"wrote {len(jobs)} scenes x 6 views -> {root}")


if __name__ == "__main__":
    main()
