"""Box format conversions and IoU variants (pure jnp, shape-preserving).

TPU-native equivalents of `/root/reference/src/utils/general_yolo.py:97-121,
613-714` (converters, clip/scale) and
`/root/reference/src/utils/metrics_yolo.py:202-265` (CIoU/DIoU/GIoU,
pairwise IoU). All functions are elementwise/batched and fuse into
surrounding XLA programs; none mutate in place (boxes are returned).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xyxy2xywh(boxes: jax.Array) -> jax.Array:
    """(..., 4) [x1,y1,x2,y2] -> [cx,cy,w,h]."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(boxes: jax.Array) -> jax.Array:
    """(..., 4) [cx,cy,w,h] -> [x1,y1,x2,y2]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xywhn2xyxy(boxes: jax.Array, w: float, h: float, padw: float = 0.0, padh: float = 0.0) -> jax.Array:
    """Normalized [cx,cy,w,h] -> pixel [x1,y1,x2,y2] with optional pad shift."""
    cx, cy, bw, bh = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(boxes: jax.Array, w: float, h: float, clip: bool = False, eps: float = 0.0) -> jax.Array:
    """Pixel [x1,y1,x2,y2] -> normalized [cx,cy,w,h]."""
    if clip:
        boxes = clip_boxes(boxes, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [((x1 + x2) / 2) / w, ((y1 + y2) / 2) / h, (x2 - x1) / w, (y2 - y1) / h], axis=-1
    )


def clip_boxes(boxes: jax.Array, shape_hw) -> jax.Array:
    """Clip xyxy boxes to image bounds (h, w)."""
    h, w = shape_hw[0], shape_hw[1]
    x1 = jnp.clip(boxes[..., 0:1], 0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def scale_boxes(img1_shape, boxes: jax.Array, img0_shape, ratio_pad=None) -> jax.Array:
    """Rescale xyxy boxes from letterboxed img1 frame back to img0 frame.

    Parity: `/root/reference/src/utils/general_yolo.py:97-111`.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    shift = jnp.array([pad[0], pad[1], pad[0], pad[1]], boxes.dtype)
    boxes = (boxes - shift) / gain
    return clip_boxes(boxes, img0_shape)


def box_iou(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M).

    Parity: `/root/reference/src/utils/metrics_yolo.py:243-265`.
    """
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])
    inter = jnp.clip(rb - lt, 0).prod(axis=-1)
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def bbox_iou(
    box1: jax.Array,
    box2: jax.Array,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = 1e-7,
) -> jax.Array:
    """Elementwise IoU / GIoU / DIoU / CIoU of aligned box arrays (..., 4).

    Parity: `/root/reference/src/utils/metrics_yolo.py:200-238`, including the
    CIoU alpha term being treated as a constant w.r.t. gradients.
    """
    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
        w1, h1 = box1[..., 2], box1[..., 3]
        w2, h2 = box2[..., 2], box2[..., 3]
    else:
        b1, b2 = box1, box2
        w1, h1 = b1[..., 2] - b1[..., 0], b1[..., 3] - b1[..., 1]
        w2, h2 = b2[..., 2] - b2[..., 0], b2[..., 3] - b2[..., 1]
    b1_x1, b1_y1, b1_x2, b1_y2 = b1[..., 0], b1[..., 1], b1[..., 2], b1[..., 3]
    b2_x1, b2_y1, b2_x2, b2_y2 = b2[..., 0], b2[..., 1], b2[..., 2], b2[..., 3]

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (CIoU or DIoU or GIoU):
        return iou
    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area
