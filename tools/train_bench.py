"""Training-step throughput on the real chip.

Measures the full jitted DP train step (photometric + homographic
augmentation, double forward, joint detector/descriptor/object losses,
gradient update) for YOLOPoint-S at KITTI-crop and COCO-640 shapes.

  python tools/train_bench.py [--batch 32] [--size 640] [--version s]
                              [--host-warp] [--scan K]

NOTE (dev-tunnel caveat): per-dispatch numbers measured through a remoted
device tunnel include multi-second per-call argument round trips that do
not exist on a real TPU host. The device-time ground truth comes from
scanning steps inside one program (--scan K with large K, or the figures
in README "Training throughput", measured with an in-program lax.scan).
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
    p.add_argument("--host-warp", action="store_true",
                   help="warp views on host (native C++) instead of on device")
    p.add_argument("--scan", type=int, default=1,
                   help="optimizer steps per device dispatch (make_multi_step)")
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
    step = make_train_step(model, mesh, aug, obj_cfg, weights, args.nc,
                           donate=args.scan == 1)

    rng = np.random.default_rng(0)
    npts, nbox = 128, 32
    batch_np = {
        "image": rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32),
        "points": rng.uniform(0, S - 1, (B, npts, 2)).astype(np.float32),
        "point_mask": np.ones((B, npts), bool),
        "boxes": np.concatenate([
            rng.integers(0, args.nc, (B, nbox, 1)).astype(np.float32),
            rng.uniform(0.3, 0.7, (B, nbox, 2)).astype(np.float32),
            rng.uniform(0.05, 0.3, (B, nbox, 2)).astype(np.float32),
        ], axis=-1),
        "box_mask": np.ones((B, nbox), bool),
    }
    if args.host_warp:
        from yolopoint_tpu.data.host_augment import host_warp_views

        t0 = time.perf_counter()
        batch_np = host_warp_views(batch_np, aug, np.random.default_rng(1))
        print(f"host_warp_views: {time.perf_counter()-t0:.2f}s/batch (host)")

    key = jax.random.PRNGKey(1)
    if args.scan > 1:
        from yolopoint_tpu.training.step import make_multi_step, stack_batches

        multi = make_multi_step(step, args.scan)
        stacked = shard_batch(
            stack_batches([batch_np] * args.scan), mesh, leading_stack=True
        )
        t0 = time.perf_counter()
        state, aux = multi(state, stacked, key)
        jax.block_until_ready(aux["loss"])
        print(f"compile+first dispatch: {time.perf_counter()-t0:.0f}s  "
              f"loss={float(aux['loss'][-1]):.3f}")
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, aux = multi(state, stacked, jax.random.fold_in(key, i))
        jax.block_until_ready(aux["loss"])
        dt = (time.perf_counter() - t0) / (args.iters * args.scan)
    else:
        batch = shard_batch(batch_np, mesh)
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
    print(f"train step B={B} {S}px {'f32' if args.f32 else 'bf16'}"
          f"{' host-warp' if args.host_warp else ''}"
          f"{f' scan{args.scan}' if args.scan > 1 else ''}: "
          f"{dt*1e3:.1f} ms/step  {B/dt:.1f} img/s/chip")


if __name__ == "__main__":
    main()
