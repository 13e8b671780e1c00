"""One profiling entry point for the real chip (VERDICT r4 #10: the former
11 tools/profile_*.py scripts shared identical timing scaffolding).

  python tools/profile.py <subcommand> [args]

Subcommands (what used to be a script each):
  decode            per-stage decode micro-benchmarks (heatmap, extract,
                    fused box NMS, descriptor sampling)
  inference         forward vs full-pipeline split + FLOPs/MFU estimate
  pipeline-stages   in-situ decode attribution (one fused program per stage)
  box-stages        stages inside fused_detect_nms
  decode-opts       gather-based vs full-map box-decode formulations
  k-sweep           candidate-cap K sweep for the box path
  gather-opts       top-k + candidate-fetch layout variants
  select-variants   Pallas greedy NMS vs XLA Jacobi + fused path
  topk-opts         lax.top_k vs approx_max_k exactness + speed
  topk-stage2       PartialReduce aggregate_to_topk split hypothesis
  train-breakdown   train-step decomposition (delegates to
                    tools/train_profile_breakdown.py, which keeps its own
                    argparse surface)

Sync discipline (applies to every subcommand): the tunneled axon backend's
`block_until_ready` can return before device execution finishes, so every
measurement dispatches a chunk of calls and then FETCHES a scalar reduction
of the last output — the device stream executes programs in submission
order, so the fetch is a true barrier for the whole chunk.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# ---------------------------------------------------------------- scaffolding

def setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return jax


def _scalar(out):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    x = leaves[0]
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    return x.reshape(-1)[:1].astype(jnp.float32).sum()


def timeit(fn, args, label, iters=10, width=52, jit=True):
    """Chunk-dispatch timing with a scalar-fetch barrier. Returns fn(*args)."""
    import jax

    f = jax.jit(fn) if jit else fn
    float(jax.device_get(_scalar(f(*args))))   # compile + warm
    float(jax.device_get(_scalar(f(*args))))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(*args)
    float(jax.device_get(_scalar(out)))        # in-order stream: syncs chunk
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:{width}s} {dt*1e3:9.2f} ms/batch", flush=True)
    return f(*args), dt


# ------------------------------------------------------------- shared inputs

def _detect_levels(B, dtype=None, scale=0.2, loc=0.0, seed=0):
    """Raw Detect training-mode outputs for the 640px 80-class head."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.normal(loc, 1.0, (B, 3, 640 // s, 640 // s, 85))
                    * scale, dtype)
        for s in (8, 16, 32)
    ]


def _anchors_ps():
    import jax.numpy as jnp

    from yolopoint_tpu.models.detect import Detect

    return jnp.asarray(Detect(nc=80).anchors_per_stride(), jnp.float32)


def _fullmap_decode_fn(B, anchors_ps, strides=(8, 16, 32), conf_thres=0.25):
    """The full-map compact box decode (elementwise, no gather) used by the
    decode-opts and k-sweep studies; mirrors ops/nms.py:fused_detect_nms."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.ops.boxes import xywh2xyxy

    def fullmap(o0, o1, o2):
        boxes_l, gated_l, cls_l = [], [], []
        for li, r in enumerate((o0, o1, o2)):
            _, na, ny, nx, no = r.shape
            s = float(strides[li])
            rf = r.astype(jnp.float32)
            obj = jax.nn.sigmoid(rf[..., 4])
            cls_logit = rf[..., 5:]
            cls_idx = cls_logit.argmax(-1).astype(jnp.int32)
            sc = obj * jax.nn.sigmoid(cls_logit.max(-1))
            gated = jnp.where((obj > conf_thres) & (sc > conf_thres), sc, -1.0)
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
        return (jnp.concatenate(boxes_l, 1), jnp.concatenate(gated_l, 1),
                jnp.concatenate(cls_l, 1))

    return fullmap


# ---------------------------------------------------------------- subcommands

def cmd_decode(argv):
    ap = argparse.ArgumentParser(prog="profile.py decode")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args(argv)
    setup_jax()
    import jax.numpy as jnp

    from yolopoint_tpu.ops.heatmap import cells_to_heatmap
    from yolopoint_tpu.ops.keypoints import extract_keypoints
    from yolopoint_tpu.ops.nms import fused_detect_nms
    from yolopoint_tpu.ops.sampling import sample_descriptors

    B = args.batch
    rng = np.random.default_rng(0)
    semi = jnp.asarray(rng.normal(size=(B, 80, 80, 65)), jnp.float32)
    heat = jnp.asarray(rng.uniform(0, 0.2, (B, 640, 640)), jnp.float32)
    desc = jnp.asarray(rng.normal(size=(B, 80, 80, 256)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 639, (B, 1000, 2)), jnp.float32)
    objs = _detect_levels(B)
    anchors = _anchors_ps()

    timeit(cells_to_heatmap, (semi,), "cells_to_heatmap")
    timeit(lambda h: extract_keypoints(h, 0.015, 4, 1000, 4),
           (heat,), "extract_keypoints (pallas)")
    timeit(lambda o0, o1, o2: fused_detect_nms(
               [o0, o1, o2], anchors, (8, 16, 32),
               conf_thres=0.25, iou_thres=0.45, max_det=300),
           tuple(objs), "fused_detect_nms")
    timeit(sample_descriptors, (desc, pts), "sample_descriptors")
    timeit(lambda s: extract_keypoints(cells_to_heatmap(s), 0.015, 4, 1000, 4),
           (semi,), "heatmap+extract fused")


def cmd_inference(argv):
    ap = argparse.ArgumentParser(prog="profile.py inference")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    from bench import _build_pipeline

    B = args.batch
    pipe = _build_pipeline(B)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, 640, 640, 3)), jnp.float32)
    fwd = jax.jit(lambda x: pipe.model.apply(
        pipe.variables, x.astype(pipe.compute_dtype), train=False,
        decode=False))

    _, t_fwd = timeit(fwd, (img,), "forward only", iters=args.iters,
                      jit=False)
    _, t_all = timeit(pipe, (img,), "full pipeline", iters=args.iters,
                      jit=False)
    print(f"{'decode (difference)':52s} {(t_all-t_fwd)*1e3:9.2f} ms/batch")
    try:
        ca = fwd.lower(img).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops", 0.0)
        print(f"forward flops/batch: {flops/1e9:.1f} GF "
              f"({flops/B/1e9:.2f} GF/img); achieved "
              f"{flops/t_fwd/1e12:.1f} TFLOP/s")
        ca2 = pipe._jitted.lower(img).compile().cost_analysis()
        ca2 = ca2[0] if isinstance(ca2, list) else ca2
        print(f"pipeline flops/batch: {ca2.get('flops',0)/1e9:.1f} GF, "
              f"bytes {ca2.get('bytes accessed',0)/1e9:.2f} GB; achieved "
              f"{ca2.get('flops',0)/t_all/1e12:.1f} TFLOP/s, "
              f"{ca2.get('bytes accessed',0)/t_all/1e9:.0f} GB/s")
    except Exception as e:
        print("cost_analysis unavailable:", e)


def cmd_pipeline_stages(argv):
    ap = argparse.ArgumentParser(prog="profile.py pipeline-stages")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)
    setup_jax()
    import jax.numpy as jnp

    from bench import _build_pipeline
    from yolopoint_tpu.ops.heatmap import cells_to_heatmap
    from yolopoint_tpu.ops.keypoints import extract_keypoints
    from yolopoint_tpu.ops.nms import fused_detect_nms

    B = args.batch
    pipe = _build_pipeline(B)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, 640, 640, 3)), jnp.float32)

    def fwd_only(x):
        return pipe.model.apply(pipe.variables, x.astype(pipe.compute_dtype),
                                train=False, decode=False)

    def with_heat(x):
        return cells_to_heatmap(fwd_only(x)["semi"].astype(jnp.float32))

    def with_extract(x):
        heat = cells_to_heatmap(fwd_only(x)["semi"].astype(jnp.float32))
        return extract_keypoints(heat, pipe.conf_thresh, pipe.nms_radius,
                                 pipe.top_k, pipe.border)

    def with_boxes(x):
        out = fwd_only(x)
        heat = cells_to_heatmap(out["semi"].astype(jnp.float32))
        kp = extract_keypoints(heat, pipe.conf_thresh, pipe.nms_radius,
                               pipe.top_k, pipe.border)
        det = fused_detect_nms(out["objects"], pipe._anchors_ps, pipe._strides,
                               conf_thres=pipe.box_conf, iou_thres=pipe.box_iou,
                               max_det=pipe.max_det)
        return kp, det

    _, t0 = timeit(fwd_only, (img,), "forward only", iters=args.iters)
    _, t1 = timeit(with_heat, (img,), "+ cells_to_heatmap", iters=args.iters)
    _, t2 = timeit(with_extract, (img,), "+ extract_keypoints", iters=args.iters)
    _, t3 = timeit(with_boxes, (img,), "+ fused box NMS", iters=args.iters)
    _, t4 = timeit(pipe, (img,), "full pipeline (+ desc sampling)",
                   iters=args.iters, jit=False)
    for label, a, b in (("cells_to_heatmap", t1, t0),
                        ("extract_keypoints", t2, t1),
                        ("fused box NMS", t3, t2),
                        ("desc sampling", t4, t3),
                        ("decode total", t4, t0)):
        print(f"{'  delta ' + label:52s} {(a-b)*1e3:9.2f} ms/batch")


def cmd_box_stages(argv):
    ap = argparse.ArgumentParser(prog="profile.py box-stages")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.ops.boxes import xywh2xyxy
    from yolopoint_tpu.ops.nms import _select_detections

    B = args.batch
    objs = _detect_levels(B, jnp.bfloat16 if args.bf16 else jnp.float32)
    anchors_ps = _anchors_ps()
    strides = (8, 16, 32)
    conf_thres, iou_thres, max_det, max_nms = 0.25, 0.45, 300, 1024

    def stage1(o0, o1, o2):
        obj_all = jnp.concatenate(
            [jax.nn.sigmoid(r[..., 4].astype(jnp.float32)).reshape(B, -1)
             for r in (o0, o1, o2)], axis=1)
        return jnp.where(obj_all > conf_thres, obj_all, -1.0)

    gated_obj, _ = timeit(stage1, tuple(objs), "s1 obj sigmoid+gate (full map)")

    k = 2 * max_nms
    top, _ = timeit(lambda g: jax.lax.top_k(g, k), (gated_obj,),
                    f"s2 top_k k={k} over {gated_obj.shape[1]}")
    top_obj, idx = top

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

    st3, _ = timeit(stage3, tuple(objs) + (idx,), "s3 gather+decode K rows")
    boxes, cls_idx, score = st3
    score = top_obj * score

    def stage4(top_obj, score, boxes, cls_idx):
        gated = jnp.where((top_obj > 0.0) & (score > conf_thres), score, -1.0)
        sc, order = jax.lax.top_k(gated, max_nms)
        b = jnp.take_along_axis(boxes, order[..., None], axis=1)
        c = jnp.take_along_axis(cls_idx, order, axis=1)
        return b, sc, c

    st4, _ = timeit(stage4, (top_obj, score, boxes, cls_idx),
                    "s4 re-rank top_k 2048->1024")
    b4, sc4, c4 = st4
    timeit(lambda b, s, c: _select_detections(b, s, c, iou_thres, max_det,
                                              False, False),
           (b4, sc4, c4), "s5 _select_detections (K=1024)")


def cmd_decode_opts(argv):
    ap = argparse.ArgumentParser(prog="profile.py decode-opts")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.ops.nms import _select_detections, fused_detect_nms

    B = args.batch
    objs = _detect_levels(B, jnp.bfloat16)
    anchors_ps = _anchors_ps()
    conf_thres, iou_thres, max_det, max_nms = 0.25, 0.45, 300, 1024

    timeit(lambda *r: fused_detect_nms(r, anchors_ps, (8, 16, 32), conf_thres,
                                       iou_thres, max_det, max_nms),
           tuple(objs), "A  fused_detect_nms @HEAD (full)")

    fullmap = _fullmap_decode_fn(B, anchors_ps, conf_thres=conf_thres)
    fm, _ = timeit(fullmap, tuple(objs),
                   "B1 full-map compact decode (no gather)")
    boxes, gated, cls = fm
    top, _ = timeit(lambda g: jax.lax.top_k(g, max_nms), (gated,),
                    f"B2 top_k k={max_nms} over {gated.shape[1]}")
    sc, idx = top
    g3, _ = timeit(
        lambda b, c, i: (jnp.take_along_axis(b, i[..., None], axis=1),
                         jnp.take_along_axis(c, i, axis=1)),
        (boxes, cls, idx), "B3 4-wide row gather (K=1024)")
    tb, tc = g3

    def b_full(o0, o1, o2):
        boxes, gated, cls = fullmap(o0, o1, o2)
        sc, idx = jax.lax.top_k(gated, max_nms)
        tb = jnp.take_along_axis(boxes, idx[..., None], axis=1)
        tc = jnp.take_along_axis(cls, idx, axis=1)
        out = _select_detections(tb, sc, tc, iou_thres, max_det, False, False)
        out["n_candidates"] = (gated > 0.0).sum(1).astype(jnp.int32)
        return out

    timeit(b_full, tuple(objs), "B  full-map decode + NMS (full)")
    timeit(lambda b, s, c: _select_detections(b, s, c, iou_thres, max_det,
                                              False, False),
           (tb, sc, tc), "S  _select_detections (K=1024)")


def cmd_k_sweep(argv):
    ap = argparse.ArgumentParser(prog="profile.py k-sweep")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.ops.nms import _select_detections

    B, N = args.batch, 25200
    rng = np.random.default_rng(0)
    objs = _detect_levels(B, jnp.bfloat16)
    anchors_ps = _anchors_ps()
    iou_thres, max_det = 0.45, 300
    score = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    fullmap = _fullmap_decode_fn(B, anchors_ps)

    def b_full(k):
        def fn(o0, o1, o2):
            boxes, gated, cls = fullmap(o0, o1, o2)
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
            rng.uniform(0.2, 1.0, size=(B, k)).astype(np.float32)),
            axis=1)[:, ::-1]
        cls = jnp.asarray(rng.integers(0, 80, size=(B, k)).astype(np.int32))
        timeit(lambda b, s, c: _select_detections(b, s, c, iou_thres, max_det,
                                                  False, False),
               (boxes, sc, cls), f"_select_detections K={k}")
    for k in (256, 512, 1024):
        timeit(b_full(k), tuple(objs), f"B full box path max_nms={k}")


def cmd_gather_opts(argv):
    ap = argparse.ArgumentParser(prog="profile.py gather-opts")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    B, N, K = args.batch, 25200, 1024
    rng = np.random.default_rng(0)
    score = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    planes = jnp.asarray(rng.normal(size=(B, 6, N)).astype(np.float32))
    boxes_bn4 = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))

    timeit(lambda s: jax.lax.top_k(s, K), (score,), "t0 top_k(score, 1024)")

    def sort_payload(score, planes):
        ops = (jnp.negative(score),) + tuple(planes[:, i, :] for i in range(6))
        out = jax.lax.sort(ops, dimension=-1, num_keys=1)
        return tuple(o[:, :K] for o in out)

    timeit(sort_payload, (score, planes), "t1 lax.sort key+6 payloads, slice K")
    timeit(lambda s: jax.lax.approx_max_k(s, K, recall_target=0.99), (score,),
           "t2 approx_max_k(1024, recall .99)")

    _, idx = jax.jit(lambda s: jax.lax.top_k(s, K))(score)
    timeit(lambda b, i: jnp.take_along_axis(b, i[..., None], axis=1),
           (boxes_bn4, idx), "t3 take_along_axis (B,N,4) rows")
    timeit(lambda p, i: tuple(
               jnp.take_along_axis(p[:, c, :], i, axis=1) for c in range(6)),
           (planes, idx), "t4 6x take_along_axis (B,N) planes")
    timeit(lambda p, i: jnp.take_along_axis(p, i[:, None, :], axis=2),
           (planes, idx), "t5 take_along_axis (B,6,N) lanes")

    def onehot_gather(planes, idx):
        out = jnp.zeros((B, K, 6), jnp.float32)
        CH = 8400
        for c0 in range(0, N, CH):
            sub = planes[:, :, c0:c0 + CH]
            oh = (idx[..., None] == (c0 + jnp.arange(CH))[None, None, :]
                  ).astype(jnp.bfloat16)
            out = out + jax.lax.dot_general(
                oh, sub.astype(jnp.bfloat16), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        return out

    timeit(onehot_gather, (planes, idx), "t6 tiled one-hot MXU gather")

    def packed_topk(s):
        u = jax.lax.bitcast_convert_type(s, jnp.uint32)
        u = jnp.where(s >= 0, u | jnp.uint32(0x80000000), ~u)
        key = (u & jnp.uint32(0xFFFF8000)) | jnp.arange(
            N, dtype=jnp.uint32)[None, :]
        kk = jnp.sort(key, axis=-1)[:, ::-1][:, :K]
        return kk & jnp.uint32(0x7FFF), kk

    timeit(packed_topk, (score,), "t7 sort packed u32 key, slice K")


def cmd_select_variants(argv):
    ap = argparse.ArgumentParser(prog="profile.py select-variants")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.ops.nms import _greedy_nms_keep, fused_detect_nms
    from yolopoint_tpu.ops.pallas_box_nms import pallas_greedy_nms

    B = args.batch
    rng = np.random.default_rng(0)
    iou_thres = 0.45

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

    objs = _detect_levels(B, jnp.bfloat16)
    anchors_ps = _anchors_ps()
    for mn in (512, 1024):
        timeit(lambda *r, mn=mn: fused_detect_nms(
                   r, anchors_ps, (8, 16, 32), 0.25, 0.45, 300, mn),
               tuple(objs), f"fused_detect_nms max_nms={mn}")
    score = jnp.asarray(rng.normal(size=(B, 25200)).astype(np.float32))
    for k in (256, 512):
        timeit(lambda s, k=k: jax.lax.approx_max_k(s, k, recall_target=0.95),
               (score,), f"approx_max_k k={k} recall .95")


def cmd_topk_opts(argv):
    setup_jax()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B = 128
    cases = []
    n = 25200
    sparse = np.full((B, n), -1.0, np.float32)
    for b in range(B):
        nz = rng.integers(50, 400)
        idx = rng.choice(n, nz, replace=False)
        sparse[b, idx] = rng.uniform(0.25, 1.0, nz).astype(np.float32)
    cases.append(("box f32 sparse", jnp.asarray(sparse), 1024))
    cases.append(("box f32 dense",
                  jnp.asarray(rng.uniform(0, 1, (B, n)).astype(np.float32)),
                  1024))
    nt = 25600
    keys = np.zeros((B, nt), np.int32)
    for b in range(B):
        nz = rng.integers(500, 6000)
        idx = rng.choice(nt, nz, replace=False)
        keys[b, idx] = rng.integers(1, 2**30, nz).astype(np.int32)
    cases.append(("kpt keys int32", jnp.asarray(keys), 1000))

    for name, x, k in cases:
        ei, _ = timeit(functools.partial(jax.lax.top_k, k=k), (x,),
                       f"top_k        {name} k={k}", iters=30)
        ve, ie = jax.device_get(ei)
        for rt in (1.0, 0.99, 0.95):
            ai, _ = timeit(
                functools.partial(jax.lax.approx_max_k, k=k, recall_target=rt),
                (x,), f"approx rt={rt:4.2f} {name} k={k}", iters=30)
            va, ia = jax.device_get(ai)
            print(f"    values_equal={bool(np.array_equal(ve, va))} "
                  f"order+idx_equal={bool(np.array_equal(ie, ia))}")


def cmd_topk_stage2(argv):
    setup_jax()
    import jax
    import jax.numpy as jnp

    B, N = 128, 25200
    rng = np.random.default_rng(0)
    x = np.full((B, N), -1.0, np.float32)
    for b in range(B):
        idx = rng.choice(N, 400, replace=False)
        x[b, idx] = rng.uniform(0.25, 1.0, 400).astype(np.float32)
    x = jnp.asarray(x)
    print(f"backend: {jax.devices()[0].platform} shape ({B}, {N})")

    for k in (512, 1024):
        f_exact = jax.jit(
            lambda v, k=k: jax.lax.approx_max_k(v, k, recall_target=1.0))
        timeit(f_exact, (x,), f"approx_max_k rt=1.0 agg=True k={k}",
               iters=20, jit=False)

        def two_stage(v, k=k):
            vals, idx = jax.lax.approx_max_k(
                v, k, recall_target=1.0, aggregate_to_topk=False)
            sv, si = jax.lax.top_k(vals, k)
            return sv, jnp.take_along_axis(idx, si, axis=-1)

        o2, _ = timeit(two_stage, (x,),
                       f"PartialReduce + small top_k k={k}", iters=20)
        a = np.asarray(jax.device_get(f_exact(x)[0]))
        b = np.asarray(jax.device_get(o2[0]))
        print(f"    values_equal="
              f"{np.array_equal(np.sort(a, -1), np.sort(b, -1))}")
        sh = jax.eval_shape(
            lambda v: jax.lax.approx_max_k(v, k, recall_target=1.0,
                                           aggregate_to_topk=False), x)
        print(f"    (unaggregated l = {sh[0].shape[-1]})")

    from yolopoint_tpu.ops.nms import fused_detect_nms

    anchors_ps = _anchors_ps()
    levels = _detect_levels(B, jnp.float32, scale=1.0, loc=-4.0, seed=1)
    for mn in (512, 1024):
        timeit(lambda ls, mn=mn: fused_detect_nms(
                   ls, anchors_ps, (8, 16, 32), max_nms=mn),
               (levels,), f"fused_detect_nms max_nms={mn}")


COMMANDS = {
    "decode": cmd_decode,
    "inference": cmd_inference,
    "pipeline-stages": cmd_pipeline_stages,
    "box-stages": cmd_box_stages,
    "decode-opts": cmd_decode_opts,
    "k-sweep": cmd_k_sweep,
    "gather-opts": cmd_gather_opts,
    "select-variants": cmd_select_variants,
    "topk-opts": cmd_topk_opts,
    "topk-stage2": cmd_topk_stage2,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("train-breakdown", "train"):
        # keeps its own argparse surface (state-carrying slope timing)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "train_profile_breakdown",
            Path(__file__).with_name("train_profile_breakdown.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.argv = ["train_profile_breakdown.py"] + argv[1:]
        return mod.main()
    if not argv or argv[0] not in COMMANDS:
        names = ", ".join(list(COMMANDS) + ["train-breakdown"])
        print(f"usage: python tools/profile.py <{names}> [args]")
        return 2 if argv else 0
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
