"""Empirical image<->label alignment check through build_training_views.

Renders a checkerboard (dense, unambiguous corners), pushes it through the
on-device augmentation with photometric OFF, then measures the distance from
each labels_2d pixel to the nearest cv2.goodFeaturesToTrack corner on the
WARPED image. Misalignment between the image warp and the point warp shows up
as a systematic multi-pixel gap.

  JAX_PLATFORMS=cpu python tools/diag_alignment.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
import cv2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolopoint_tpu.data.synthetic import _rng_for, draw_checkerboard, _background
from yolopoint_tpu.data.augmentation import build_training_views

H, W = 256, 320
rng = _rng_for(17, "val", 1234)
img = _background(rng, H, W)
pts, _ = draw_checkerboard(rng, img)
inside = (pts[:, 0] >= 0) & (pts[:, 0] <= W - 1) & (pts[:, 1] >= 0) & (pts[:, 1] <= H - 1)
pts = pts[inside]
print(f"{len(pts)} gt corners")

img3 = np.repeat(img[..., None], 3, 2).astype(np.float32) / 255.0
N = 64
P = np.zeros((1, N, 2), np.float32)
M = np.zeros((1, N), bool)
P[0, :len(pts)] = pts
M[0, :len(pts)] = True

cfg = {
    "photometric": {"enable": False},
    "homographic": {"enable": True, "params": {
        "perspective": True, "scaling": True, "rotation": True,
        "translation": True, "patch_ratio": 0.85,
        "perspective_amplitude_x": 0.2, "perspective_amplitude_y": 0.2,
        "scaling_amplitude": 0.2, "max_angle": 1.57},
        "valid_border_margin": 3},
    "warped_pair": {"params": {
        "perspective": True, "scaling": True, "rotation": True,
        "translation": True, "patch_ratio": 0.85},
        "valid_border_margin": 3},
}

import functools
bt = jax.jit(functools.partial(build_training_views, config=cfg))
for trial in range(4):
    key = jax.random.PRNGKey(trial)
    base, warped = bt(
        key, jnp.asarray(img3[None]), jnp.asarray(P), jnp.asarray(M),
        jnp.zeros((1, 1, 5)), jnp.zeros((1, 1), bool))
    for name, view in (("base", base), ("warped", warped)):
        im = np.asarray(view.image)[0, ..., 0]
        lab = np.asarray(view.labels_2d)[0]
        ys, xs = np.nonzero(lab > 0.5)
        if len(xs) < 4:
            print(f"t{trial} {name}: only {len(xs)} labels, skip")
            continue
        im8 = np.clip(im * 255, 0, 255).astype(np.uint8)
        corners = cv2.goodFeaturesToTrack(im8, 200, 0.05, 4)
        if corners is None:
            continue
        corners = corners.reshape(-1, 2)  # (x, y)
        lp = np.stack([xs, ys], 1).astype(np.float32)
        d = np.linalg.norm(lp[:, None] - corners[None], axis=-1).min(1)
        print(f"t{trial} {name}: {len(lp)} labels; dist to nearest detected corner: "
              f"median {np.median(d):.2f}px p90 {np.percentile(d, 90):.2f}px "
              f"<=2px {(d <= 2).mean():.2f}")
