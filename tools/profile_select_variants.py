"""Pallas per-image greedy NMS vs batched XLA Jacobi at serving shapes,
plus the rewritten fused_detect_nms end-to-end."""

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
    from yolopoint_tpu.ops.nms import _greedy_nms_keep, fused_detect_nms
    from yolopoint_tpu.ops.pallas_box_nms import pallas_greedy_nms

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    iou_thres = 0.45

    def _scalar(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        x = leaves[0]
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.int32)
        return x.reshape(-1)[:1].astype(jnp.float32).sum()

    def timeit(fn, args, label, iters=10):
        f = jax.jit(fn)
        float(jax.device_get(_scalar(f(*args))))
        float(jax.device_get(_scalar(f(*args))))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*args)
        float(jax.device_get(_scalar(out)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:52s} {dt*1e3:9.2f} ms/batch", flush=True)
        return f(*args)

    for K in (256, 512, 1024):
        centers = rng.uniform(50, 590, (B, K, 2)).astype(np.float32)
        wh = rng.uniform(10, 80, (B, K, 2)).astype(np.float32)
        boxes = jnp.asarray(
            np.concatenate([centers - wh / 2, centers + wh / 2], -1))
        valid = jnp.asarray(rng.random((B, K)) < 0.3)
        timeit(lambda b, v: pallas_greedy_nms(b, v, iou_thres),
               (boxes, valid), f"pallas_greedy_nms K={K}")
        timeit(lambda b, v: jax.vmap(_greedy_nms_keep, in_axes=(0, 0, None))(
                   b, v, iou_thres),
               (boxes, valid), f"xla jacobi vmap K={K}")

    objs = [
        jnp.asarray(rng.normal(size=(B, 3, 640 // s, 640 // s, 85)) * 0.2,
                    jnp.bfloat16)
        for s in (8, 16, 32)
    ]
    anchors_ps = jnp.asarray(Detect(nc=80).anchors_per_stride(), jnp.float32)
    for mn in (512, 1024):
        timeit(lambda *r, mn=mn: fused_detect_nms(
                   r, anchors_ps, (8, 16, 32), 0.25, 0.45, 300, mn),
               tuple(objs), f"NEW fused_detect_nms max_nms={mn}")

    # approx_max_k option (would relax exactness; measured for the record)
    score = jnp.asarray(rng.normal(size=(B, 25200)).astype(np.float32))
    for k in (256, 512):
        timeit(lambda s, k=k: jax.lax.approx_max_k(s, k, recall_target=0.95),
               (score,), f"approx_max_k k={k} recall .95")


if __name__ == "__main__":
    main()
