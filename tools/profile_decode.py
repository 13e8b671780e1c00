"""Time each decode stage separately at headline batch size (real chip).

Sync discipline: the tunneled backend's `block_until_ready` can return
before execution (see bench.py train-step note), so every measurement
dispatches `iters` calls and then fetches a scalar reduction of the LAST
output — the device stream executes programs in submission order, so the
fetch is a true barrier for the whole chunk.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from yolopoint_tpu.models.detect import Detect
    from yolopoint_tpu.ops.heatmap import cells_to_heatmap
    from yolopoint_tpu.ops.keypoints import extract_keypoints
    from yolopoint_tpu.ops.nms import fused_detect_nms
    from yolopoint_tpu.ops.sampling import sample_descriptors

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    semi = jnp.asarray(rng.normal(size=(B, 80, 80, 65)), jnp.float32)
    heat = jnp.asarray(rng.uniform(0, 0.2, (B, 640, 640)), jnp.float32)
    desc = jnp.asarray(rng.normal(size=(B, 80, 80, 256)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 639, (B, 1000, 2)), jnp.float32)
    # raw Detect training-mode outputs: (B, na, ny, nx, nc+5) per level
    objs = [
        jnp.asarray(rng.normal(size=(B, 3, 640 // s, 640 // s, 85)) * 0.2,
                    jnp.float32)
        for s in (8, 16, 32)
    ]
    anchors = Detect(nc=80).anchors_per_stride()

    def _scalar(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        x = leaves[0]
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.int32)
        return x.reshape(-1)[:1].astype(jnp.float32).sum()

    def timeit(fn, args, label, iters=10):
        f = jax.jit(fn)
        float(jax.device_get(_scalar(f(*args))))  # compile + warm
        float(jax.device_get(_scalar(f(*args))))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*args)
        float(jax.device_get(_scalar(out)))  # in-order stream: syncs chunk
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:32s} {dt*1e3:9.2f} ms/batch", flush=True)
        return dt

    timeit(cells_to_heatmap, (semi,), "cells_to_heatmap")
    timeit(
        lambda h: extract_keypoints(h, 0.015, 4, 1000, 4),
        (heat,), "extract_keypoints (pallas)",
    )
    timeit(
        lambda o0, o1, o2: fused_detect_nms(
            [o0, o1, o2], anchors, (8, 16, 32),
            conf_thres=0.25, iou_thres=0.45, max_det=300,
        ),
        tuple(objs), "fused_detect_nms",
    )
    timeit(sample_descriptors, (desc, pts), "sample_descriptors")
    timeit(
        lambda s: extract_keypoints(cells_to_heatmap(s), 0.015, 4, 1000, 4),
        (semi,), "heatmap+extract fused",
    )


if __name__ == "__main__":
    main()
