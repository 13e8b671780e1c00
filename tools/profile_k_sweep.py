"""Sweep candidate-cap K: top_k cost, gather cost, _select_detections cost,
and the full Option-B fused box path at each K. Picks the serving max_nms."""

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
    N = 25200
    rng = np.random.default_rng(0)
    objs = [
        jnp.asarray(rng.normal(size=(B, 3, 640 // s, 640 // s, 85)) * 0.2,
                    jnp.bfloat16)
        for s in (8, 16, 32)
    ]
    anchors_ps = jnp.asarray(Detect(nc=80).anchors_per_stride(), jnp.float32)
    strides = (8, 16, 32)
    conf_thres, iou_thres, max_det = 0.25, 0.45, 300
    score = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))

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

    def b_full(k):
        def fn(o0, o1, o2):
            boxes_l, gated_l, cls_l = [], [], []
            for li, r in enumerate((o0, o1, o2)):
                _, na, ny, nx, no = r.shape
                s = float(strides[li])
                rf = r.astype(jnp.float32)
                obj = jax.nn.sigmoid(rf[..., 4])
                cls_logit = rf[..., 5:]
                cls_max = cls_logit.max(-1)
                cls_idx = cls_logit.argmax(-1).astype(jnp.int32)
                sc = obj * jax.nn.sigmoid(cls_max)
                gated = jnp.where((obj > conf_thres) & (sc > conf_thres),
                                  sc, -1.0)
                gy = jax.lax.broadcasted_iota(jnp.float32, (na, ny, nx), 1)
                gx = jax.lax.broadcasted_iota(jnp.float32, (na, ny, nx), 2)
                xy = (jax.nn.sigmoid(rf[..., 0:2]) * 2.0 - 0.5
                      + jnp.stack([gx, gy], -1)) * s
                wh = ((jax.nn.sigmoid(rf[..., 2:4]) * 2.0) ** 2
                      * (anchors_ps[li] * s)[None, :, None, None, :])
                box = xywh2xyxy(jnp.concatenate([xy, wh], -1))
                boxes_l.append(box.reshape(B, -1, 4))
                gated_l.append(gated.reshape(B, -1))
                cls_l.append(cls_idx.reshape(B, -1))
            boxes = jnp.concatenate(boxes_l, 1)
            gated = jnp.concatenate(gated_l, 1)
            cls = jnp.concatenate(cls_l, 1)
            sc, idx = jax.lax.top_k(gated, k)
            tb = jnp.take_along_axis(boxes, idx[..., None], axis=1)
            tc = jnp.take_along_axis(cls, idx, axis=1)
            out = _select_detections(tb, sc, tc, iou_thres, max_det,
                                     False, False)
            out["n_candidates"] = (gated > 0.0).sum(1).astype(jnp.int32)
            return out
        return fn

    for k in (128, 256, 512, 1024):
        timeit(lambda s, kk=k: jax.lax.top_k(s, kk), (score,),
               f"top_k k={k} over {N}")
    for k in (256, 512, 1024):
        boxes = jnp.asarray(rng.normal(size=(B, k, 4)).astype(np.float32)) * 100
        sc = jnp.sort(jnp.asarray(
            rng.uniform(0.2, 1.0, size=(B, k)).astype(np.float32)), axis=1)[:, ::-1]
        cls = jnp.asarray(rng.integers(0, 80, size=(B, k)).astype(np.int32))
        timeit(lambda b, s, c: _select_detections(b, s, c, iou_thres, max_det,
                                                  False, False),
               (boxes, sc, cls), f"_select_detections K={k}")
    for k in (256, 512, 1024):
        timeit(b_full(k), tuple(objs), f"B full box path max_nms={k}")


if __name__ == "__main__":
    main()
