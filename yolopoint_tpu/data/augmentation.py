"""On-device homographic augmentation + warped-pair generation.

Re-design of the reference's per-sample CPU augmentation
(`_homographic_augmentation` `/root/reference/src/datasets/DataClasses.py:279-367`,
`_get_warped_pair` `:369-454`): one batched, jit-able function that
* samples a batch of random homographies (`sample_homography_batch`),
* warps images (bilinear) and valid masks (nearest) on device,
* warps keypoints (fixed-shape `(N, 2)` + mask) and rasterizes label maps,
* warps box labels corner-wise with `box_candidates` filtering as a mask
  (`/root/reference/src/utils/augmentations_yolo.py:59-64`),
* optionally composes with photometric augmentation.

Everything is fixed-shape; "dropped" points/boxes just get mask=False.
"""

from __future__ import annotations

from typing import Any, Mapping, NamedTuple

import jax
import jax.numpy as jnp

from yolopoint_tpu.data.photometric import photometric_augment
from yolopoint_tpu.ops.boxes import clip_boxes, xywhn2xyxy, xyxy2xywhn
from yolopoint_tpu.ops.geometry import (
    compute_valid_mask,
    filter_points_mask,
    homography_scaling,
    points_to_label_map,
    warp_image,
    warp_points,
)
from yolopoint_tpu.ops.homography import sample_homography_batch


class AugmentedView(NamedTuple):
    """One homographically-augmented view of a batch."""

    image: jax.Array          # (B, H, W, C)
    labels_2d: jax.Array      # (B, H, W) keypoint map
    valid_mask: jax.Array     # (B, H, W)
    points: jax.Array         # (B, N, 2) warped keypoints
    point_mask: jax.Array     # (B, N)
    boxes: jax.Array          # (B, M, 5) [cls, cx, cy, w, h] normalized
    box_mask: jax.Array       # (B, M)
    homography: jax.Array     # (B, 3, 3) normalized coords
    inv_homography: jax.Array # (B, 3, 3)


def box_candidates_mask(
    new_xyxy: jax.Array,
    old_xyxy: jax.Array,
    wh_thr: float = 7.0,
    area_thr: float = 25.0,
    wr_thresh: float = 0.2,
    hr_thresh: float = 0.2,
) -> jax.Array:
    """Mask version of `box_candidates`
    (`/root/reference/src/utils/augmentations_yolo.py:59-64`)."""
    w1 = new_xyxy[..., 2] - new_xyxy[..., 0]
    h1 = new_xyxy[..., 3] - new_xyxy[..., 1]
    w2 = jnp.maximum(old_xyxy[..., 2] - old_xyxy[..., 0], 1e-9)
    h2 = jnp.maximum(old_xyxy[..., 3] - old_xyxy[..., 1], 1e-9)
    return (
        (w1 > wh_thr) & (h1 > wh_thr) & (w1 * h1 > area_thr)
        & (w1 / w2 > wr_thresh) & (h1 / h2 > hr_thresh)
    )


def _warp_boxes(
    boxes: jax.Array,
    box_mask: jax.Array,
    inv_h_pix: jax.Array,
    height: int,
    width: int,
) -> tuple[jax.Array, jax.Array]:
    """Warp normalized xywh boxes corner-wise (reference warps the two xyxy
    corner points through the pixel-space inverse homography,
    `DataClasses.py:358-366` via `_homographic_augmentation` labels path)."""
    cls = boxes[..., 0:1]
    xyxy = xywhn2xyxy(boxes[..., 1:5], width, height)  # (B, M, 4)
    tl = xyxy[..., 0:2]
    br = xyxy[..., 2:4]
    tl_w = jax.vmap(warp_points)(tl, inv_h_pix)
    br_w = jax.vmap(warp_points)(br, inv_h_pix)
    new_xyxy = jnp.concatenate([tl_w, br_w], axis=-1)
    clipped = clip_boxes(new_xyxy, (height, width))
    keep = box_candidates_mask(clipped, new_xyxy) & box_mask
    new_boxes = jnp.concatenate([cls, xyxy2xywhn(clipped, width, height, clip=False)], axis=-1)
    return new_boxes, keep


def flip_augment(
    key: jax.Array,
    images: jax.Array,
    points: jax.Array,
    boxes: jax.Array,
    horizontal: float = 0.0,
    vertical: float = 0.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-image random horizontal/vertical flips of image + points + boxes.

    Parity: `flip` `/root/reference/src/utils/homographies.py:149-179`
    (config `augmentation.homographic.flipping`, applied train-only). Boxes
    are normalized xywh so a flip just mirrors cx/cy.
    """
    B, H, W, _ = images.shape
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, horizontal, (B,)) if horizontal else jnp.zeros(B, bool)
    do_v = jax.random.bernoulli(kv, vertical, (B,)) if vertical else jnp.zeros(B, bool)

    img_h = jnp.where(do_h[:, None, None, None], images[:, :, ::-1], images)
    img_hv = jnp.where(do_v[:, None, None, None], img_h[:, ::-1], img_h)

    px = jnp.where(do_h[:, None], (W - 1) - points[..., 0], points[..., 0])
    py = jnp.where(do_v[:, None], (H - 1) - points[..., 1], points[..., 1])
    new_points = jnp.stack([px, py], axis=-1)

    bx = jnp.where(do_h[:, None], 1.0 - boxes[..., 1], boxes[..., 1])
    by = jnp.where(do_v[:, None], 1.0 - boxes[..., 2], boxes[..., 2])
    new_boxes = jnp.concatenate(
        [boxes[..., 0:1], bx[..., None], by[..., None], boxes[..., 3:5]], axis=-1
    )
    return img_hv, new_points, new_boxes


def homographic_augment(
    key: jax.Array,
    images: jax.Array,
    points: jax.Array,
    point_mask: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    hom_params: Mapping[str, Any] | None = None,
    valid_border_margin: int = 0,
    pad: tuple[int, int, int, int] = (0, 0, 0, 0),
) -> AugmentedView:
    """Sample per-image homographies and produce the warped view.

    Args:
      images: `(B, H, W, C)` float batch.
      points: `(B, N, 2)` keypoint labels (pixel coords) + mask.
      boxes: `(B, M, 5)` `[cls, cx, cy, w, h]` normalized + mask.
      hom_params: `data.augmentation.homographic.params` of the YAML schema.
      valid_border_margin: erosion radius for the valid mask.
      pad: letterbox padding excluded from the valid region.
    """
    B, H, W, _ = images.shape
    params = dict(hom_params or {})
    homography = sample_homography_batch(key, B, **params)
    inv_homography = jnp.linalg.inv(homography)

    warped_image = warp_image(images, homography)
    valid_mask = compute_valid_mask((H, W), homography, valid_border_margin, pad)

    # points warp with the INVERSE homography in pixel coords
    # (reference warpLabels, utils.py:429-441)
    inv_pix = jax.vmap(lambda h: homography_scaling(h, H, W))(inv_homography)
    pts = jnp.floor(points)
    warped_pts = jax.vmap(warp_points)(pts, inv_pix)
    pmask = point_mask & jax.vmap(lambda p: filter_points_mask(p, (W, H)))(warped_pts)
    labels_2d = jax.vmap(lambda p, m: points_to_label_map(p, m, H, W))(warped_pts, pmask)

    new_boxes, new_box_mask = _warp_boxes(boxes, box_mask, inv_pix, H, W)

    return AugmentedView(
        image=warped_image,
        labels_2d=labels_2d,
        valid_mask=valid_mask,
        points=warped_pts,
        point_mask=pmask,
        boxes=new_boxes,
        box_mask=new_box_mask,
        homography=homography,
        inv_homography=inv_homography,
    )


def build_training_views(
    key: jax.Array,
    images: jax.Array,
    points: jax.Array,
    point_mask: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    config: Mapping[str, Any],
) -> tuple[AugmentedView, AugmentedView]:
    """Produce the (base, warped) training pair from raw host batches.

    Mirrors the reference's per-sample flow (photometric -> homographic aug of
    the base image -> second homography for the warped pair with its own
    photometric pass, `DataClasses.py:159-454`) but batched on device. The
    base view may be un-warped (identity) when homographic aug is disabled.

    `config` is the `data.augmentation` YAML subtree.
    """
    B, H, W, _ = images.shape
    k_ph1, k_ph2, k_hom1, k_hom2, k_flip = jax.random.split(key, 5)

    phot_cfg = (config.get("photometric") or {})
    phot_params = phot_cfg.get("params") or {}
    phot_enabled = bool(phot_cfg.get("enable", False))

    hom_cfg = (config.get("homographic") or {})
    hom_params = hom_cfg.get("params") or {}
    hom_enabled = bool(hom_cfg.get("enable", False))
    margin = int(hom_cfg.get("valid_border_margin", 0))

    if flipping := hom_cfg.get("flipping"):
        images, points, boxes = flip_augment(
            k_flip, images, points, boxes,
            horizontal=float(flipping.get("horizontal", 0.0)),
            vertical=float(flipping.get("vertical", 0.0)),
        )

    base_img = photometric_augment(k_ph1, images, phot_params) if phot_enabled else images

    if hom_enabled:
        base = homographic_augment(
            k_hom1, base_img, points, point_mask, boxes, box_mask, hom_params, margin
        )
    else:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
        labels_2d = jax.vmap(lambda p, m: points_to_label_map(p, m, H, W))(
            jnp.floor(points), point_mask
        )
        ones = jnp.zeros((B, H, W), jnp.float32).at[:, 1:-1, 1:-1].set(1.0)
        base = AugmentedView(base_img, labels_2d, ones, points, point_mask,
                             boxes, box_mask, eye, eye)

    # warped pair: second homography applied to the base view
    warp_cfg = (config.get("warped_pair") or {})
    warp_params = warp_cfg.get("params") or hom_params
    warped = homographic_augment(
        k_hom2, base.image, base.points, base.point_mask, base.boxes, base.box_mask,
        warp_params, int(warp_cfg.get("valid_border_margin", margin)),
    )
    if phot_enabled:
        warped = warped._replace(image=photometric_augment(k_ph2, warped.image, phot_params))
    return base, warped
