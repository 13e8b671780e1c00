"""Micro-profile the stages inside fused_detect_nms at headline batch size.

Same sync discipline as tools/profile_decode.py (fetch a scalar of the last
output of a dispatched chunk — a true in-order execution barrier on the
tunneled backend).
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
    from yolopoint_tpu.ops.nms import _select_detections
    from yolopoint_tpu.ops.boxes import xywh2xyxy

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt_in = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    objs = [
        jnp.asarray(rng.normal(size=(B, 3, 640 // s, 640 // s, 85)) * 0.2, dt_in)
        for s in (8, 16, 32)
    ]
    anchors_ps = jnp.asarray(Detect(nc=80).anchors_per_stride(), jnp.float32)
    strides = (8, 16, 32)
    conf_thres, iou_thres, max_det, max_nms = 0.25, 0.45, 300, 1024

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
        print(f"{label:36s} {dt*1e3:9.2f} ms/batch", flush=True)
        return f(*args)

    # stage 1: full-map objectness sigmoid + gate
    def stage1(o0, o1, o2):
        obj_all = jnp.concatenate(
            [jax.nn.sigmoid(r[..., 4].astype(jnp.float32)).reshape(B, -1)
             for r in (o0, o1, o2)], axis=1)
        return jnp.where(obj_all > conf_thres, obj_all, -1.0)

    gated_obj = timeit(stage1, tuple(objs), "s1 obj sigmoid+gate (full map)")

    # stage 2: top_k over (B, N) for k=2*max_nms
    k = 2 * max_nms
    top = timeit(lambda g: jax.lax.top_k(g, k), (gated_obj,),
                 f"s2 top_k k={k} over {gated_obj.shape[1]}")
    top_obj, idx = top

    # stage 3: gather + decode K rows
    def stage3(o0, o1, o2, idx):
        no = 85
        rows = jnp.zeros((B, k, no), jnp.float32)
        gx = jnp.zeros((B, k), jnp.float32)
        gy = jnp.zeros((B, k), jnp.float32)
        stride_c = jnp.ones((B, k), jnp.float32)
        anc = jnp.zeros((B, k, 2), jnp.float32)
        off = 0
        for li, r in enumerate((o0, o1, o2)):
            _, na, ny, nx, _ = r.shape
            nl = na * ny * nx
            s = float(strides[li])
            inr = (idx >= off) & (idx < off + nl)
            loc = jnp.clip(idx - off, 0, nl - 1)
            g = jnp.take_along_axis(r.reshape(B, nl, no), loc[..., None],
                                    axis=1).astype(jnp.float32)
            rows = jnp.where(inr[..., None], g, rows)
            a = loc // (ny * nx)
            rem = loc % (ny * nx)
            gy = jnp.where(inr, (rem // nx).astype(jnp.float32), gy)
            gx = jnp.where(inr, (rem % nx).astype(jnp.float32), gx)
            stride_c = jnp.where(inr, s, stride_c)
            anc = jnp.where(inr[..., None],
                            jnp.take(anchors_ps[li] * s, a, axis=0), anc)
            off += nl
        xy = (jax.nn.sigmoid(rows[..., 0:2]) * 2.0 - 0.5
              + jnp.stack([gx, gy], axis=-1)) * stride_c[..., None]
        wh = (jax.nn.sigmoid(rows[..., 2:4]) * 2.0) ** 2 * anc
        boxes = xywh2xyxy(jnp.concatenate([xy, wh], axis=-1))
        cls_logit = rows[..., 5:]
        cls_idx = cls_logit.argmax(axis=-1).astype(jnp.int32)
        score = jnp.zeros((B, k), jnp.float32) + jax.nn.sigmoid(cls_logit.max(-1))
        return boxes, cls_idx, score

    boxes, cls_idx, score = timeit(stage3, tuple(objs) + (idx,),
                                   "s3 gather+decode K rows")
    score = top_obj * score

    # stage 4: final-conf re-rank top_k (2048 -> 1024)
    def stage4(top_obj, score, boxes, cls_idx):
        gated = jnp.where((top_obj > 0.0) & (score > conf_thres), score, -1.0)
        sc, order = jax.lax.top_k(gated, max_nms)
        b = jnp.take_along_axis(boxes, order[..., None], axis=1)
        c = jnp.take_along_axis(cls_idx, order, axis=1)
        return b, sc, c

    b4, sc4, c4 = timeit(stage4, (top_obj, score, boxes, cls_idx),
                         "s4 re-rank top_k 2048->1024")

    # stage 5: suppression + selection
    timeit(lambda b, s, c: _select_detections(b, s, c, iou_thres, max_det,
                                              False, False),
           (b4, sc4, c4), "s5 _select_detections (K=1024)")


if __name__ == "__main__":
    main()
