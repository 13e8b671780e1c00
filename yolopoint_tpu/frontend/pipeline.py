"""The end-to-end inference pipeline: one jitted program per frame batch.

Replaces `/root/reference/src/demo.py:97-230` (`process_img`): preprocess is
host-side numpy (resize + mod-32 center crop, `:97-123`); everything after
image upload happens on device in ONE XLA program — model forward, 65-ch
softmax + depth-to-space heatmap, iterative keypoint NMS + top-k + border
filter, class-offset box NMS, optional suppression of keypoints inside
detected boxes (`:178-198`), bilinear descriptor sampling + L2 renorm
(`:200-215`). Only the final fixed-shape arrays cross back to host, where
coordinates are shifted back to the original frame (`:217-228`).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolopoint_tpu.ops.heatmap import cells_to_heatmap
from yolopoint_tpu.ops.keypoints import extract_keypoints
from yolopoint_tpu.ops.nms import fused_detect_nms
from yolopoint_tpu.ops.sampling import sample_descriptors


def preprocess_frame(
    img: np.ndarray,
    img_size: Optional[int] = None,
    stride: int = 32,
) -> tuple[np.ndarray, tuple[int, int], float]:
    """Resize so the longer side is `img_size` (if given), then center-crop to
    a stride multiple. Returns (float image [0,1], (top, left) crop offset,
    resize ratio) — the reference `crop_resize`, `/root/reference/src/demo.py:97-123`.
    """
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    ratio = 1.0
    if img_size:
        ratio = img_size / max(h, w)
        if ratio != 1.0:
            import cv2

            interp = cv2.INTER_AREA if ratio < 1 else cv2.INTER_LINEAR
            img = cv2.resize(img, (int(round(w * ratio)), int(round(h * ratio))), interpolation=interp)
            h, w = img.shape[:2]
    hc, wc = (h // stride) * stride, (w // stride) * stride
    top, left = (h - hc) // 2, (w - wc) // 2
    img = img[top:top + hc, left:left + wc]
    if img.ndim == 2:
        img = img[..., None]
    return np.ascontiguousarray(img, np.float32), (top, left), ratio


def _points_in_boxes(points: jax.Array, boxes: jax.Array, box_valid: jax.Array) -> jax.Array:
    """(N,) True where a point lies inside ANY valid box (for suppression,
    reference `filter_pts` `/root/reference/src/demo.py:178-198`)."""
    x, y = points[:, 0:1], points[:, 1:2]  # (N, 1)
    inside = (
        (x >= boxes[None, :, 0]) & (x <= boxes[None, :, 2])
        & (y >= boxes[None, :, 1]) & (y <= boxes[None, :, 3])
    )  # (N, M)
    return (inside & box_valid[None, :]).any(axis=1)


class InferencePipeline:
    """Jitted forward + decode for a fixed input shape.

    Args:
      model: a built Flax module (`build_model(...)`).
      variables: `{'params': ..., 'batch_stats': ...}` (or folded params with
        a `fused=True` model).
      config: keypoint/box operating points — keys follow the reference YAML
        (`model.superpoint.*`, `model.yolo.*`; see `configs/*.yaml` and
        BASELINE.md):
        detection_threshold, nms (radius), top_k, border_remove,
        conf_thresh, iou_thresh, max_det, filter_pts_in_boxes.
      compute_dtype: cast inputs to bf16 for the conv stack if desired.
    """

    def __init__(
        self,
        model,
        variables: Mapping[str, Any],
        config: Optional[Mapping[str, Any]] = None,
        compute_dtype=jnp.float32,
    ):
        cfg = dict(config or {})
        self.model = model
        # pin params on device once — numpy leaves (e.g. from fold_batch_norm)
        # would otherwise re-upload the whole tree on every dispatch
        self.variables = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, variables)
        )
        self.conf_thresh = float(cfg.get("detection_threshold", 0.015))
        self.nms_radius = int(cfg.get("nms", 4))
        self.top_k = int(cfg.get("top_k", 1000))
        self.border = int(cfg.get("border_remove", 4))
        self.box_conf = float(cfg.get("conf_thresh", 0.25))
        self.box_iou = float(cfg.get("iou_thresh", 0.45))
        self.max_det = int(cfg.get("max_det", 300))
        # NMS candidate cap (final-confidence truncation point; the
        # n_candidates output reports when it binds)
        self.max_nms = int(cfg.get("max_nms", 1024))
        # serving fast path: bf16 heatmap halves the depth-to-space relayout
        # + keypoint-NMS HBM traffic (~2 ms at B=128/640px); scores quantize
        # to ~0.4% of range. Default keeps the exact f32 heatmap.
        self.heatmap_dtype = (
            jnp.bfloat16 if str(cfg.get("heatmap_dtype", "f32")).lower()
            in ("bf16", "bfloat16") else jnp.float32
        )
        self.filter_pts_in_boxes = bool(cfg.get("filter_pts_in_boxes", False))
        # MXU one-hot descriptor sampling (bf16 matmul, ~4x faster than the
        # XLA gather at deploy batch sizes); set exact_descriptors: true to
        # force the exact f32 gather path
        self.exact_descriptors = bool(cfg.get("exact_descriptors", False))
        # the full-res heatmap is a large (B, H, W) f32 output — only
        # materialize it when a consumer asks (debug/eval)
        self.return_heatmap = bool(cfg.get("return_heatmap", False))
        self.compute_dtype = compute_dtype
        # static decode tables for the fused objectness-gated box path
        self._anchors_ps = None
        self._strides = tuple(getattr(model, "strides", (8, 16, 32)))
        if getattr(model, "anchors", None) is not None:
            from yolopoint_tpu.models.detect import Detect

            self._anchors_ps = Detect(
                nc=getattr(model, "nc", 80), anchors=model.anchors
            ).anchors_per_stride()
        self._jitted = jax.jit(self._process)

    def _process(self, images: jax.Array) -> dict[str, jax.Array]:
        if images.dtype == jnp.uint8:
            # u8 ingest: 4x less host->device transfer; normalize on device
            images = images.astype(self.compute_dtype) / 255.0
        out = self.model.apply(
            self.variables, images.astype(self.compute_dtype), train=False, decode=False
        )
        heat = cells_to_heatmap(out["semi"].astype(jnp.float32),
                                dtype=self.heatmap_dtype)
        pts, scores, valid = extract_keypoints(
            heat, self.conf_thresh, self.nms_radius, self.top_k, self.border
        )

        result: dict[str, jax.Array] = {
            "keypoints": pts,
            "kp_scores": scores,
            "kp_valid": valid,
        }
        if self.return_heatmap:
            result["heatmap"] = heat

        if "objects" in out:
            # fused path: compact full-map decode + final-conf top-k + NMS
            det = fused_detect_nms(
                out["objects"], self._anchors_ps, self._strides,
                conf_thres=self.box_conf,
                iou_thres=self.box_iou,
                max_det=self.max_det,
                max_nms=self.max_nms,
            )
            result.update(
                boxes=det["boxes"], box_scores=det["scores"],
                box_classes=det["classes"], box_valid=det["valid"],
                # telemetry: confidence-gated candidate count; values above
                # max_nms mean the cap truncated (lowest-conf first, the
                # reference's own over-cap behavior)
                box_n_candidates=det["n_candidates"],
            )
            if self.filter_pts_in_boxes:
                suppress = jax.vmap(_points_in_boxes)(pts, det["boxes"], det["valid"])
                result["kp_valid"] = valid & ~suppress

        from yolopoint_tpu.ops.pallas_gather import (
            sample_descriptors_pallas, sampling_fits_pallas,
        )
        from yolopoint_tpu.ops.pallas_nms import pallas_available

        if (
            not self.exact_descriptors
            and pallas_available()
            and sampling_fits_pallas(out["desc"].shape)
        ):
            desc = sample_descriptors_pallas(out["desc"], pts)
        else:
            desc = sample_descriptors(out["desc"].astype(jnp.float32), pts)
        result["descriptors"] = desc
        return result

    def __call__(self, images) -> dict[str, jax.Array]:
        """Run on a `(B, H, W, C)` batch (H, W multiples of 32) — float in
        [0, 1] or uint8 (normalized on device)."""
        return self._jitted(jnp.asarray(images))

    def sharded(self, mesh=None):
        """Data-parallel serving: returns `fn(images)` whose batch is
        sharded over the mesh's `data` axis (params replicated, outputs
        batch-sharded). Scales offline eval / pseudo-label export / bulk
        inference across all chips with zero code changes — XLA partitions
        the whole forward+decode program; there are no cross-image
        collectives in the pipeline so scaling is embarrassingly parallel.

        Use: `fn = pipe.sharded(); out = fn(images)` with the global batch a
        multiple of the mesh size (shard the host batch with
        `parallel.mesh.shard_batch` to avoid a gather on dispatch).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from yolopoint_tpu.parallel.mesh import DATA_AXIS, make_mesh

        mesh = mesh or make_mesh()
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(
            self._process,
            in_shardings=(batch_sh,),
            out_shardings=batch_sh,
        )

    def process_frame(self, frame: np.ndarray, img_size: Optional[int] = None) -> dict[str, np.ndarray]:
        """Single-frame convenience mirroring `process_img`
        (`/root/reference/src/demo.py:125-230`): preprocess, run, and shift
        coordinates back into the original frame."""
        img, (top, left), ratio = preprocess_frame(frame, img_size)
        out = {k: np.asarray(v) for k, v in self(img[None]).items()}
        out = {k: v[0] for k, v in out.items()}
        out["keypoints"] = (out["keypoints"] + np.array([left, top])) / ratio
        if "boxes" in out:
            out["boxes"] = (out["boxes"] + np.array([left, top, left, top])) / ratio
        return out
