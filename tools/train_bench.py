"""Training-step throughput on the real chip.

Measures the full jitted DP train step (on-device photometric + homographic
augmentation, double forward, joint detector/descriptor/object losses,
gradient update) for YOLOPoint-S at KITTI-crop and COCO-640 shapes.

  python tools/train_bench.py [--batch 32] [--size 640] [--version s]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--version", default="s")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights, make_train_step, rescale_yolo_gains,
    )

    B, S = args.batch, args.size
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = build_model("YOLOPoint", args.version, nc=args.nc, dtype=dtype)
    mesh = make_mesh()
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=10,
                        steps_per_epoch=100)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, S, S, 3), tx=tx)

    aug = {
        "photometric": {"enable": True, "params": {
            "random_brightness": {"max_abs_change": 50},
            "random_contrast": {"strength_range": [0.5, 1.5]},
        }},
        "homographic": {"enable": True, "params": {
            "perspective": True, "scaling": True, "rotation": True,
            "translation": True, "patch_ratio": 0.85,
        }, "valid_border_margin": 3},
        "warped_pair": {"params": {"perspective": True, "scaling": True,
                                    "rotation": True, "translation": True,
                                    "patch_ratio": 0.85}},
    }
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=args.nc, img_size=S)
    weights = LossWeights()
    step = make_train_step(model, mesh, aug, obj_cfg, weights, args.nc)

    rng = np.random.default_rng(0)
    npts, nbox = 128, 32
    batch = shard_batch({
        "image": rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32),
        "points": rng.uniform(0, S - 1, (B, npts, 2)).astype(np.float32),
        "point_mask": np.ones((B, npts), bool),
        "boxes": np.concatenate([
            rng.integers(0, args.nc, (B, nbox, 1)).astype(np.float32),
            rng.uniform(0.3, 0.7, (B, nbox, 2)).astype(np.float32),
            rng.uniform(0.05, 0.3, (B, nbox, 2)).astype(np.float32),
        ], axis=-1),
        "box_mask": np.ones((B, nbox), bool),
    }, mesh)

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, aux = step(state, batch, key)
    jax.block_until_ready(aux["loss"])
    print(f"compile+first step: {time.perf_counter()-t0:.0f}s  "
          f"loss={float(aux['loss']):.3f}")

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, aux = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(aux["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step B={B} {S}px {'f32' if args.f32 else 'bf16'}: "
          f"{dt*1e3:.1f} ms/step  {B/dt:.1f} img/s/chip")


if __name__ == "__main__":
    main()
