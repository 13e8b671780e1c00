"""Fixed-shape, device-resident box NMS.

Replaces the reference's `non_max_suppression`
(`/root/reference/src/utils/general_yolo.py:124-235`), whose core is the
native `torchvision.ops.nms` C++/CUDA kernel plus ragged per-image python
lists. Here the whole pipeline — confidence gating, class-offset trick,
greedy IoU suppression, max_det capping — is one jittable function over
padded `(B, N, 5+nc)` predictions returning `(B, max_det, 6)` + validity
masks. Greedy suppression is a `fori_loop` over a precomputed IoU matrix
(O(K^2) elementwise work on the VPU, K = top-k candidate cap).

`fused_detect_nms` is the serving fast path: it gates candidates by
objectness on the RAW Detect levels and decodes only the surviving top-K —
skipping the full `(B, ΣN, 5+nc)` f32 decode the reference materializes
before `non_max_suppression` (`yolo.py:49-70` + `general_yolo.py:124`),
which is the HBM hot spot of inference decode on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from yolopoint_tpu.ops.boxes import box_iou, xywh2xyxy

MAX_WH = 7680.0  # class-offset magnitude, reference general_yolo.py:152


def _greedy_nms_keep(boxes: jax.Array, valid: jax.Array, iou_thres: float) -> jax.Array:
    """Greedy suppression over score-sorted boxes. Returns keep mask (N,).

    Serial greedy NMS is a well-founded recursion (box i is suppressed iff
    some higher-priority SURVIVING box overlaps it). Instead of N sequential
    steps we run Jacobi fixed-point iterations of that recursion — one
    (N, N) masked reduction per step, VPU-friendly — which reaches the exact
    greedy solution within `suppression-chain depth` iterations (single
    digits in practice); the while_loop exits at convergence.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]  # row suppresses strictly later cols
    overlap = (iou > iou_thres) & later & valid[:, None] & valid[None, :]

    def cond(carry):
        keep, prev, i = carry
        return jnp.logical_and(i < n, jnp.any(keep != prev))

    def body(carry):
        keep, _, i = carry
        suppressed = jnp.any(overlap & keep[:, None], axis=0)
        return valid & ~suppressed, keep, i + 1

    keep0 = valid & ~jnp.any(overlap, axis=0)  # first step from keep=valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, valid, jnp.array(1)))
    return keep


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "agnostic", "multi_label"),
)
def batched_box_nms(
    prediction: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 1024,
    agnostic: bool = False,
    multi_label: bool = False,
) -> dict[str, jax.Array]:
    """Batched class-aware NMS on decoded YOLO predictions.

    Args:
      prediction: `(B, N, 5+nc)` decoded predictions `[cx, cy, w, h, obj,
        cls...]` (the concatenated inference output of the Detect head).
      conf_thres: objectness/score gate.
      iou_thres: suppression IoU.
      max_det: fixed number of detections returned per image.
      max_nms: candidate cap fed to greedy suppression (reference: 30000; we
        top-k to a TPU-friendly fixed K — beyond-cap candidates are the
        lowest-score ones and virtually never survive anyway).
      agnostic: class-agnostic NMS (no class offset).
      multi_label: emit one candidate per (box, class) over the gate instead
        of argmax class only.

    Returns:
      dict with `boxes` `(B, max_det, 4)` xyxy, `scores` `(B, max_det)`,
      `classes` `(B, max_det)` int32, `valid` `(B, max_det)` bool.

    Parity: `/root/reference/src/utils/general_yolo.py:124-235` (same
    suppression order and class-offset trick; fixed-shape outputs).
    """
    nc = prediction.shape[-1] - 5

    def per_image(x):
        obj = x[:, 4]
        cls_conf = x[:, 5:] * obj[:, None]  # conf = obj * cls
        box = xywh2xyxy(x[:, :4])
        if multi_label and nc > 1:
            # (N, nc) candidates -> flatten; gate each (box, class) pair
            scores_mat = jnp.where(obj[:, None] > conf_thres, cls_conf, 0.0)
            scores = scores_mat.reshape(-1)
            boxes_f = jnp.repeat(box, nc, axis=0)
            classes = jnp.tile(jnp.arange(nc), x.shape[0])
            cand = scores > conf_thres
        else:
            scores = cls_conf.max(axis=-1)
            classes = cls_conf.argmax(axis=-1)
            boxes_f = box
            cand = (obj > conf_thres) & (scores > conf_thres)

        gated = jnp.where(cand, scores, -1.0)
        k = min(max_nms, gated.shape[0])
        top_scores, top_idx = jax.lax.top_k(gated, k)
        top_boxes = boxes_f[top_idx]
        top_classes = classes[top_idx]
        top_valid = top_scores > 0.0

        offset = 0.0 if agnostic else top_classes.astype(top_boxes.dtype)[:, None] * MAX_WH
        keep = _greedy_nms_keep(top_boxes + offset, top_valid, iou_thres)

        kept_scores = jnp.where(keep, top_scores, -1.0)
        k_out = min(max_det, kept_scores.shape[0])
        out_scores, out_idx = jax.lax.top_k(kept_scores, k_out)
        pad = max_det - k_out
        if pad:
            out_scores = jnp.pad(out_scores, (0, pad), constant_values=-1.0)
            out_idx = jnp.pad(out_idx, (0, pad))
        return {
            "boxes": top_boxes[out_idx],
            "scores": jnp.maximum(out_scores, 0.0),
            "classes": top_classes[out_idx].astype(jnp.int32),
            "valid": out_scores > 0.0,
        }

    return jax.vmap(per_image)(prediction)


@functools.lru_cache(maxsize=8)
def _detect_flat_tables(level_shapes, anchors_key, strides):
    """Static per-candidate decode tables in the RAW flat order (a, gy, gx)
    per level, levels concatenated: grid x/y, pixel anchor w/h, stride.

    `level_shapes` is a tuple of (na, ny, nx); `anchors_key` a hashable
    nested tuple of the per-stride anchors.
    """
    anchors_ps = np.asarray(anchors_key, np.float32)  # (nl, na, 2)
    gx, gy, aw, ah, st = [], [], [], [], []
    for li, (na, ny, nx) in enumerate(level_shapes):
        s = float(strides[li])
        shape = (na, ny, nx)
        gx.append(np.broadcast_to(np.arange(nx, dtype=np.float32), shape).ravel())
        gy.append(np.broadcast_to(np.arange(ny, dtype=np.float32)[None, :, None], shape).ravel())
        aw.append(np.broadcast_to((anchors_ps[li, :, 0] * s)[:, None, None], shape).ravel())
        ah.append(np.broadcast_to((anchors_ps[li, :, 1] * s)[:, None, None], shape).ravel())
        st.append(np.full(na * ny * nx, s, np.float32))
    # numpy (not jnp): this cache outlives traces — device constants are
    # materialized at each use site instead
    cat = np.concatenate
    return cat(gx), cat(gy), cat(aw), cat(ah), cat(st)


def fused_detect_nms(  # call inside jit; anchors_ps must be a concrete array
    raw_levels,
    anchors_ps,
    strides=(8, 16, 32),
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 1024,
    agnostic: bool = False,
) -> dict[str, jax.Array]:
    """Objectness-gated decode + NMS straight from the raw Detect levels.

    Instead of decoding every anchor to a `(B, ΣN, 5+nc)` f32 tensor and
    top-k-ing it (the reference inference path, `yolo.py:49-70` ->
    `general_yolo.py:124-235`), gate by sigmoid(obj) on the raw logits,
    select the top `max_nms` candidates per image, and decode/classify ONLY
    those — ~25x less decode math and HBM traffic at 640 px.

    Semantics match `batched_box_nms` on decoded predictions exactly
    whenever at most `max_nms` candidates pass the objectness gate (the cap
    here ranks by objectness instead of final class score).

    Args:
      raw_levels: nl raw Detect tensors `(B, na, ny, nx, 5+nc)` (any dtype).
      anchors_ps: `(nl, na, 2)` per-stride anchors
        (`Detect.anchors_per_stride()`).
    """
    B = raw_levels[0].shape[0]
    level_shapes = tuple(tuple(r.shape[1:4]) for r in raw_levels)
    anchors_key = tuple(
        tuple(tuple(a) for a in lvl)
        for lvl in np.asarray(anchors_ps, np.float32).tolist()
    )
    tables = _detect_flat_tables(level_shapes, anchors_key, tuple(strides))
    gx, gy, aw, ah, st = (jnp.asarray(t) for t in tables)

    y = jnp.concatenate([r.reshape(B, -1, r.shape[-1]) for r in raw_levels], axis=1)
    obj = jax.nn.sigmoid(y[..., 4].astype(jnp.float32))          # (B, N)
    gated = jnp.where(obj > conf_thres, obj, -1.0)
    k = min(max_nms, gated.shape[1])
    obj_k, idx = jax.lax.top_k(gated, k)                         # (B, K)

    rows = jnp.take_along_axis(
        y, idx[..., None], axis=1
    ).astype(jnp.float32)                                        # (B, K, no)
    sig = jax.nn.sigmoid(rows)
    grid = jnp.stack([gx[idx], gy[idx]], axis=-1)                # (B, K, 2)
    anchor = jnp.stack([aw[idx], ah[idx]], axis=-1)
    stride = st[idx][..., None]
    xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = (sig[..., 2:4] * 2.0) ** 2 * anchor
    boxes = xywh2xyxy(jnp.concatenate([xy, wh], axis=-1))        # (B, K, 4)

    cls_conf = sig[..., 5:] * sig[..., 4:5]
    scores = cls_conf.max(axis=-1)
    classes = cls_conf.argmax(axis=-1)
    valid = (obj_k > conf_thres) & (scores > conf_thres)

    # score-sorted greedy order (parity with batched_box_nms)
    sort_scores = jnp.where(valid, scores, -1.0)
    top_scores, order = jax.lax.top_k(sort_scores, k)
    boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    classes = jnp.take_along_axis(classes, order, axis=1)
    top_valid = top_scores > 0.0

    offset = 0.0 if agnostic else classes.astype(boxes.dtype)[..., None] * MAX_WH
    keep = jax.vmap(_greedy_nms_keep, in_axes=(0, 0, None))(
        boxes + offset, top_valid, iou_thres
    )

    kept_scores = jnp.where(keep, top_scores, -1.0)
    k_out = min(max_det, k)
    out_scores, out_idx = jax.lax.top_k(kept_scores, k_out)
    pad = max_det - k_out
    if pad:
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)), constant_values=-1.0)
        out_idx = jnp.pad(out_idx, ((0, 0), (0, pad)))
    return {
        "boxes": jnp.take_along_axis(boxes, out_idx[..., None], axis=1),
        "scores": jnp.maximum(out_scores, 0.0),
        "classes": jnp.take_along_axis(classes, out_idx, axis=1).astype(jnp.int32),
        "valid": out_scores > 0.0,
    }
