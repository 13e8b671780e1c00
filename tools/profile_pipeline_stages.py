"""In-situ decode attribution: forward + progressively more decode stages.

Each stage is jitted as ONE program (like the serving pipeline), so deltas
between consecutive stages give the *fused, in-situ* cost of each decode
component — micro-benchmarks of isolated stages over-count by the tunnel's
~2.7 ms dispatch floor and under-count fusion effects.

Run on the real chip: `python tools/profile_pipeline_stages.py [--batch 128]`.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bench import _build_pipeline
    from yolopoint_tpu.ops.heatmap import cells_to_heatmap
    from yolopoint_tpu.ops.keypoints import extract_keypoints
    from yolopoint_tpu.ops.nms import fused_detect_nms

    B = args.batch
    pipe = _build_pipeline(B)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, 640, 640, 3)), jnp.float32
    )

    def fwd_only(x):
        return pipe.model.apply(
            pipe.variables, x.astype(pipe.compute_dtype), train=False,
            decode=False,
        )

    def with_heat(x):
        out = fwd_only(x)
        return cells_to_heatmap(out["semi"].astype(jnp.float32))

    def with_extract(x):
        out = fwd_only(x)
        heat = cells_to_heatmap(out["semi"].astype(jnp.float32))
        return extract_keypoints(
            heat, pipe.conf_thresh, pipe.nms_radius, pipe.top_k, pipe.border
        )

    def with_boxes(x):
        out = fwd_only(x)
        heat = cells_to_heatmap(out["semi"].astype(jnp.float32))
        kp = extract_keypoints(
            heat, pipe.conf_thresh, pipe.nms_radius, pipe.top_k, pipe.border
        )
        det = fused_detect_nms(
            out["objects"], pipe._anchors_ps, pipe._strides,
            conf_thres=pipe.box_conf, iou_thres=pipe.box_iou,
            max_det=pipe.max_det,
        )
        return kp, det

    def timeit(fn, label, base=0.0):
        f = jax.jit(fn) if not hasattr(fn, "lower") else fn
        out = f(img)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(img)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:34s} {dt*1e3:8.2f} ms/batch   (+{(dt-base)*1e3:6.2f})",
              flush=True)
        return dt

    t0 = timeit(fwd_only, "forward only")
    t1 = timeit(with_heat, "+ cells_to_heatmap", t0)
    t2 = timeit(with_extract, "+ extract_keypoints", t1)
    t3 = timeit(with_boxes, "+ fused box NMS", t2)
    t4 = timeit(pipe, "full pipeline (+ desc sampling)", t3)
    print(f"{'decode total':34s} {(t4-t0)*1e3:8.2f} ms/batch")


if __name__ == "__main__":
    main()
