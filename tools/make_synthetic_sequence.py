"""Render a synthetic camera sequence: one synthetic-shapes scene viewed
under a smoothly varying homography (simulated camera pan/zoom/rotation),
written as numbered PNG frames — input for the demo CLI + PointTracker
visualization on trained weights (the reference demos on mp4/KITTI streams,
`/root/reference/src/demo.py:63-93,232-265`, not shipped in this image).

  python tools/make_synthetic_sequence.py --out /tmp/seq --frames 48
  python -m yolopoint_tpu.frontend.demo --weights runs/synth_r2/best \
      --input /tmp/seq --save-dir /tmp/seq_out --img-size 320
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    import cv2

    from yolopoint_tpu.data.synthetic import render_sample

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_seq")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 320])
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args(argv)

    H, W = args.hw
    rng = np.random.default_rng(args.seed)
    # render one corner-rich scene at 2x resolution so warps never expose
    # out-of-bounds regions, then move a HxW window through it
    big, _, _ = render_sample(rng, 2 * H, 2 * W, None, blur_prob=0.0)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # smooth random camera path: translation + rotation + zoom, each a
    # low-frequency sinusoid with random phase
    ph = rng.uniform(0, 2 * np.pi, 4)
    for i in range(args.frames):
        t = i / max(args.frames - 1, 1)
        tx = W / 2 + 0.3 * W * np.sin(2 * np.pi * t + ph[0])
        ty = H / 2 + 0.3 * H * np.sin(2 * np.pi * t + ph[1])
        ang = 0.15 * np.sin(2 * np.pi * t + ph[2])
        zoom = 1.0 + 0.15 * np.sin(2 * np.pi * t + ph[3])
        c, s = np.cos(ang) * zoom, np.sin(ang) * zoom
        # map output pixel -> source pixel: rotate/scale about output center,
        # then translate into the big image
        cx, cy = W / 2, H / 2
        A = np.array([[c, -s, tx + cx - (c * cx - s * cy)],
                      [s, c, ty + cy - (s * cx + c * cy)]], np.float32)
        frame = cv2.warpAffine(big, A, (W, H), flags=cv2.WARP_INVERSE_MAP,
                               borderMode=cv2.BORDER_REFLECT)
        cv2.imwrite(str(out / f"{i:06d}.png"), frame)
    print(f"{args.frames} frames -> {out}")


if __name__ == "__main__":
    main()
