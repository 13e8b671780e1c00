"""On-device homographic augmentation + warped-pair generation.

Re-design of the reference's per-sample CPU augmentation
(`_homographic_augmentation` `/root/reference/src/datasets/DataClasses.py:279-367`,
`_get_warped_pair` `:369-454`): one batched, jit-able function that
* samples a batch of random homographies (`sample_homography_batch`),
* warps images (bilinear) and valid masks (nearest) on device,
* warps keypoints (fixed-shape `(N, 2)` + mask) and rasterizes label maps,
* warps box labels corner-wise with `box_candidates` filtering as a mask
  (`/root/reference/src/utils/augmentations_yolo.py:59-64`),
* composes with photometric augmentation (light pass for the pair base +
  full pass for the base view, `DataClasses.py:211-218`).

Crop-aware training (KITTI `cropHW`, mosaic) follows the reference
`homography_big` chain (`/root/reference/src/utils/homographies.py:129-143`):
the homography is sampled in the CROP's normalized frame, conjugated into the
full frame (`crop_conjugate_homography`), applied to the FULL image, and the
result is cropped — so content outside the crop flows in under the warp
instead of zero borders. The warped pair composes the two homographies and
warps the original image ONCE (`DataClasses.py:383-401`), avoiding double
resampling.

Everything is fixed-shape; "dropped" points/boxes just get mask=False.
"""

from __future__ import annotations

from typing import Any, Mapping, NamedTuple, Optional

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
    warped_pair_valid_mask,
)
from yolopoint_tpu.ops.homography import sample_homography_batch

HI = jax.lax.Precision.HIGHEST


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


def crop_conjugate_homography(
    homography: jax.Array,
    crop_yx: jax.Array,
    crop_hw: tuple[int, int],
    full_hw: tuple[int, int],
) -> jax.Array:
    """Express a crop-frame normalized homography in full-frame normalized
    coords: `C @ H @ C^-1` where C maps the crop's [-1,1]^2 onto the crop
    rectangle inside the full frame.

    This is the closed form of the reference's 4-point `homography_big`
    construction (`/root/reference/src/utils/homographies.py:129-143`).

    Args:
      homography: `(B, 3, 3)` crop-frame homographies.
      crop_yx: `(B, 2)` crop top-left `(y, x)` in full-frame pixels.
      crop_hw: static crop `(h, w)`.
      full_hw: static full-frame `(H, W)`.
    """
    hc, wc = crop_hw
    Hf, Wf = full_hw
    B = homography.shape[0]
    y0 = crop_yx[..., 0].astype(jnp.float32)
    x0 = crop_yx[..., 1].astype(jnp.float32)
    ax = wc / Wf
    ay = hc / Hf
    bx = (2.0 * x0 + wc) / Wf - 1.0
    by = (2.0 * y0 + hc) / Hf - 1.0
    zeros = jnp.zeros_like(x0)
    ones = jnp.ones_like(x0)
    C = jnp.stack([
        jnp.stack([jnp.full_like(x0, ax), zeros, bx], -1),
        jnp.stack([zeros, jnp.full_like(x0, ay), by], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], axis=-2)  # (B, 3, 3)
    C_inv = jnp.linalg.inv(C)
    return jnp.matmul(jnp.matmul(C, homography, precision=HI), C_inv, precision=HI)


def _crop_images(images: jax.Array, crop_yx: jax.Array, crop_hw: tuple[int, int]) -> jax.Array:
    """Per-sample static-size crops via dynamic_slice."""
    hc, wc = crop_hw

    def one(img, yx):
        return jax.lax.dynamic_slice(
            img, (yx[0].astype(jnp.int32), yx[1].astype(jnp.int32), 0),
            (hc, wc, img.shape[-1]),
        )

    return jax.vmap(one)(images, crop_yx)


def _warp_boxes_pix(
    xyxy: jax.Array,
    box_mask: jax.Array,
    inv_h_pix: jax.Array,
    height: int,
    width: int,
) -> tuple[jax.Array, jax.Array]:
    """Warp pixel xyxy boxes corner-wise through the pixel-space inverse
    homography (the reference warps the two xyxy corner points,
    `DataClasses.py:358-366`), clip, and box_candidates-filter."""
    tl = xyxy[..., 0:2]
    br = xyxy[..., 2:4]
    tl_w = jax.vmap(warp_points)(tl, inv_h_pix)
    br_w = jax.vmap(warp_points)(br, inv_h_pix)
    # reorder corners — homographies with a flip component (host path
    # composes flips into H) swap left/right and top/bottom
    new_xyxy = jnp.concatenate(
        [jnp.minimum(tl_w, br_w), jnp.maximum(tl_w, br_w)], axis=-1
    )
    clipped = clip_boxes(new_xyxy, (height, width))
    keep = box_candidates_mask(clipped, new_xyxy) & box_mask
    return clipped, keep


def flip_augment(
    key: jax.Array,
    images: jax.Array,
    points: jax.Array,
    boxes: jax.Array,
    horizontal: float = 0.0,
    vertical: float = 0.0,
    crop_yx: Optional[jax.Array] = None,
    crop_hw: Optional[tuple[int, int]] = None,
) -> tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """Per-image random horizontal/vertical flips of image + points + boxes.

    Parity: `flip` `/root/reference/src/utils/homographies.py:149-179`
    (config `augmentation.homographic.flipping`, applied train-only). Boxes
    are normalized xywh so a flip just mirrors cx/cy. In crop mode the crop
    offsets are mirrored with the frame.
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
    new_crop = crop_yx
    if crop_yx is not None and crop_hw is not None:
        hc, wc = crop_hw
        cy = jnp.where(do_v, H - crop_yx[..., 0] - hc, crop_yx[..., 0])
        cx = jnp.where(do_h, W - crop_yx[..., 1] - wc, crop_yx[..., 1])
        new_crop = jnp.stack([cy, cx], axis=-1)
    return img_hv, new_points, new_boxes, new_crop


def homographic_augment(
    key: Optional[jax.Array],
    images: jax.Array,
    points: jax.Array,
    point_mask: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    hom_params: Mapping[str, Any] | None = None,
    valid_border_margin: int = 0,
    pad: tuple[int, int, int, int] = (0, 0, 0, 0),
    homography: Optional[jax.Array] = None,
    crop_yx: Optional[jax.Array] = None,
    crop_hw: Optional[tuple[int, int]] = None,
    valid_src: Optional[jax.Array] = None,
    warped_image: Optional[jax.Array] = None,
    warped_valid: Optional[jax.Array] = None,
) -> AugmentedView:
    """Produce one warped view from per-image homographies.

    Args:
      images: `(B, H, W, C)` float batch — the FULL frame in crop mode.
      points: `(B, N, 2)` keypoint labels (full-frame pixel coords) + mask.
      boxes: `(B, M, 5)` `[cls, cx, cy, w, h]` normalized to the full frame.
      hom_params: `data.augmentation.homographic.params` of the YAML schema
        (ignored when `homography` is given).
      valid_border_margin: erosion radius for the valid mask.
      pad: letterbox padding excluded from the valid region.
      homography: optional `(B, 3, 3)` precomputed crop-frame homographies
        (e.g. a composed base∘pair chain).
      crop_yx / crop_hw: crop-aware mode — homographies act in the crop's
        normalized frame but warp the full image via
        `crop_conjugate_homography` before cropping (reference
        `homography_big`, `homographies.py:129-143`).
      valid_src: optional full-frame `(B, H, W)` validity to warp (nearest)
        instead of synthesizing an all-ones mask (the mosaic canvas mask,
        `DataClasses.py:318-334`).
      warped_image / warped_valid: precomputed warped image + valid mask in
        the output (crop) frame — the host-warp data path
        (`data.host_augment`) supplies these so the device step skips the
        per-pixel warp gathers; labels/points/boxes still derive from
        `homography` here.
    """
    B, Hf, Wf, _ = images.shape
    if homography is None:
        params = dict(hom_params or {})
        homography = sample_homography_batch(key, B, **params)
    inv_homography = jnp.linalg.inv(homography)
    precomputed = warped_image is not None

    if crop_yx is not None:
        assert crop_hw is not None, "crop_hw must be static when crop_yx is given"
        Hc, Wc = crop_hw
        if not precomputed or warped_valid is None:
            hom_big = crop_conjugate_homography(homography, crop_yx, crop_hw, (Hf, Wf))
        if not precomputed:
            warped_image = _crop_images(warp_image(images, hom_big), crop_yx, crop_hw)
        if warped_valid is not None:
            valid_mask = warped_valid
        elif valid_src is not None:
            vm = warp_image(valid_src[..., None], hom_big, mode="nearest")[..., 0]
            valid_mask = _crop_images(vm[..., None], crop_yx, crop_hw)[..., 0]
            valid_mask = valid_mask.at[:, :1].set(0).at[:, -1:].set(0)
            valid_mask = valid_mask.at[:, :, :1].set(0).at[:, :, -1:].set(0)
        else:
            vm = compute_valid_mask((Hf, Wf), hom_big, valid_border_margin, pad)
            valid_mask = _crop_images(vm[..., None], crop_yx, crop_hw)[..., 0]
        offset = crop_yx[:, None, ::-1].astype(jnp.float32)  # (B, 1, 2) (x, y)
        pts = jnp.floor(points) - offset
        box_xyxy = xywhn2xyxy(boxes[..., 1:5], Wf, Hf) - jnp.concatenate(
            [offset, offset], axis=-1
        )
    else:
        Hc, Wc = Hf, Wf
        if not precomputed:
            warped_image = warp_image(images, homography)
        if warped_valid is not None:
            valid_mask = warped_valid
        elif valid_src is not None:
            vm = warp_image(valid_src[..., None], homography, mode="nearest")[..., 0]
            valid_mask = vm.at[:, :1].set(0).at[:, -1:].set(0)
            valid_mask = valid_mask.at[:, :, :1].set(0).at[:, :, -1:].set(0)
        else:
            valid_mask = compute_valid_mask((Hf, Wf), homography, valid_border_margin, pad)
        pts = jnp.floor(points)
        box_xyxy = xywhn2xyxy(boxes[..., 1:5], Wf, Hf)

    # points warp with the INVERSE homography in (crop-frame) pixel coords
    # (reference warpLabels, utils.py:429-441)
    inv_pix = jax.vmap(lambda h: homography_scaling(h, Hc, Wc))(inv_homography)
    warped_pts = jax.vmap(warp_points)(pts, inv_pix)
    pmask = point_mask & jax.vmap(lambda p: filter_points_mask(p, (Wc, Hc)))(warped_pts)
    labels_2d = jax.vmap(lambda p, m: points_to_label_map(p, m, Hc, Wc))(warped_pts, pmask)

    new_xyxy, new_box_mask = _warp_boxes_pix(box_xyxy, box_mask, inv_pix, Hc, Wc)
    new_boxes = jnp.concatenate(
        [boxes[..., 0:1], xyxy2xywhn(new_xyxy, Wc, Hc, clip=False)], axis=-1
    )

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


def _identity_view(
    images, points, point_mask, boxes, box_mask, crop_yx, crop_hw,
) -> AugmentedView:
    """Un-warped view (identity homography), honoring crop mode."""
    B, Hf, Wf, _ = images.shape
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    if crop_yx is not None:
        return homographic_augment(
            None, images, points, point_mask, boxes, box_mask,
            homography=eye, crop_yx=crop_yx, crop_hw=crop_hw,
        )
    labels_2d = jax.vmap(lambda p, m: points_to_label_map(p, m, Hf, Wf))(
        jnp.floor(points), point_mask
    )
    ones = jnp.zeros((B, Hf, Wf), jnp.float32).at[:, 1:-1, 1:-1].set(1.0)
    pmask = point_mask & jax.vmap(
        lambda p: filter_points_mask(p, (Wf, Hf))
    )(points)
    return AugmentedView(images, labels_2d, ones, points, pmask,
                         boxes, box_mask, eye, eye)


def mosaic_canvas_mask(full_hw: tuple[int, int], border: int = 2) -> jax.Array:
    """Validity mask of a 2x2 equal-tile mosaic canvas: `border`-px zeros
    around each tile (the reference zeroes tile borders when composing,
    `DataClasses.py:625,648` `_remove_borders(bm=2)`)."""
    Hf, Wf = full_hw
    m = jnp.ones((Hf, Wf), jnp.float32)
    for y in (0, Hf // 2, Hf):
        m = m.at[max(y - border, 0):min(y + border, Hf)].set(0.0)
    for x in (0, Wf // 2, Wf):
        m = m.at[:, max(x - border, 0):min(x + border, Wf)].set(0.0)
    return m


def build_training_views(
    key: jax.Array,
    images: jax.Array,
    points: jax.Array,
    point_mask: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    config: Mapping[str, Any],
    crop_yx: Optional[jax.Array] = None,
    mosaic: bool = False,
    precomputed: Optional[Mapping[str, jax.Array]] = None,
) -> tuple[AugmentedView, AugmentedView]:
    """Produce the (base, warped) training pair from raw host batches.

    Mirrors the reference's per-sample flow batched on device
    (`DataClasses.py:159-454`):
      * light photometric -> pair base; light+full photometric -> base image
        (`:211-218`)
      * homographic aug of the base image (H1), crop-aware when `crop_yx`
        batches are provided (KITTI `cropHW` / mosaic center crop)
      * warped pair: second homography H2 sampled, the ORIGINAL (lightly
        augmented) image warped once by H1∘H2 (`_get_warped_pair:383-401`);
        the stored pair homography is H2 — it links base <-> warped
      * the pair's valid mask is the base mask warped by H2 (`:417-424`)
      * its own photometric pass on the warped image (`:403-405`).

    `config` is the `data.augmentation` YAML subtree. In crop/mosaic mode
    `images` is the full frame and `crop_hw` comes from
    `homographic.cropHW` (mosaic: full frame is 2x the output, center crop).

    `precomputed` (the host-warp path, `data.host_augment`): a mapping with
    `image_base`, `valid_base`, `image_pair`, `valid_pair` (warped on host
    CPU workers with the native C++ warp), `h1`, `h2` (normalized-coords
    homographies; any flip is composed into h1). The device step then skips
    every full-image warp gather and applies photometric AFTER the warp
    (pointwise color ops commute with bilinear resampling; the valid masks
    re-zero the padding), while points/boxes/labels still derive from
    h1/h2 here.
    """
    if precomputed is not None:
        return _views_from_precomputed(
            key, images, points, point_mask, boxes, box_mask, config,
            precomputed, crop_yx=crop_yx, mosaic=mosaic,
        )
    B, Hf, Wf, _ = images.shape
    if images.dtype == jnp.uint8:
        # u8 host->device payload (4x less tunnel traffic than f32 frames)
        images = images.astype(jnp.float32) / 255.0
    k_ph_light, k_ph1, k_ph2, k_hom1, k_hom2, k_flip = jax.random.split(key, 6)

    phot_cfg = (config.get("photometric") or {})
    phot_params = phot_cfg.get("params") or {}
    phot_light = phot_cfg.get("params_light")
    phot_enabled = bool(phot_cfg.get("enable", False))

    hom_cfg = (config.get("homographic") or {})
    hom_params = hom_cfg.get("params") or {}
    hom_enabled = bool(hom_cfg.get("enable", False))
    margin = int(hom_cfg.get("valid_border_margin", 0))
    if mosaic and (mcfg := hom_cfg.get("mosaic")):
        hom_params = mcfg.get("params") or hom_params

    crop_hw = None
    if crop_yx is not None:
        if mosaic:
            crop_hw = (Hf // 2, Wf // 2)
        else:
            crop_hw = tuple(hom_cfg.get("cropHW") or (Hf, Wf))

    if flipping := hom_cfg.get("flipping"):
        images, points, boxes, crop_yx = flip_augment(
            k_flip, images, points, boxes,
            horizontal=float(flipping.get("horizontal", 0.0)),
            vertical=float(flipping.get("vertical", 0.0)),
            crop_yx=crop_yx, crop_hw=crop_hw,
        )

    # reference photometric stack: pair base gets the light pass, base view
    # gets light + full (DataClasses.py:211-218)
    if phot_enabled:
        pair_img = photometric_augment(k_ph_light, images, phot_light or {}) \
            if phot_light is not None else images
        base_img = photometric_augment(k_ph1, pair_img, phot_params)
    else:
        pair_img = base_img = images

    valid_src = None
    if mosaic:
        valid_src = jnp.broadcast_to(mosaic_canvas_mask((Hf, Wf)), (B, Hf, Wf))

    if hom_enabled or mosaic:
        h1 = sample_homography_batch(k_hom1, B, **hom_params)
        base = homographic_augment(
            None, base_img, points, point_mask, boxes, box_mask,
            valid_border_margin=margin, homography=h1,
            crop_yx=crop_yx, crop_hw=crop_hw, valid_src=valid_src,
        )
    else:
        h1 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
        base = _identity_view(base_img, points, point_mask, boxes, box_mask,
                              crop_yx, crop_hw)

    # warped pair: sample H2 in the (crop-frame) normalized coords, compose
    # with H1 and warp the lightly-augmented ORIGINAL image once
    warp_cfg = (config.get("warped_pair") or {})
    warp_params = warp_cfg.get("params") or hom_params
    if mosaic and (wm := warp_cfg.get("mosaic_params")):
        warp_params = wm
    h2 = sample_homography_batch(k_hom2, B, **warp_params)
    h12 = jnp.matmul(h1, h2, precision=HI)
    warped = homographic_augment(
        None, pair_img, points, point_mask, boxes, box_mask,
        valid_border_margin=int(warp_cfg.get("valid_border_margin", margin)),
        homography=h12, crop_yx=crop_yx, crop_hw=crop_hw, valid_src=valid_src,
    )
    # the pair's valid mask is the BASE mask warped by H2 (reference
    # `_get_warped_pair:417-424`), and the stored homography is H2
    if crop_yx is None and valid_src is None:
        # the base mask is analytic (preimage of a rectangle + border +
        # erosion), so its h2-warp is closed-form coordinate math — replaces
        # a ~36 ms nearest-gather per (16,640,640) batch in the train step
        base_margin = margin if hom_enabled else 0
        pair_mask = warped_pair_valid_mask(
            base.valid_mask.shape[1:3], h1, h2, erosion_radius=base_margin,
        )
    else:
        pair_mask = warp_image(
            base.valid_mask[..., None], h2, mode="nearest")[..., 0]
    warped = warped._replace(
        valid_mask=pair_mask,
        homography=h2,
        inv_homography=jnp.linalg.inv(h2),
    )
    if phot_enabled:
        pair_phot = (warp_cfg.get("photometric") or {}).get("params") or phot_params
        warped = warped._replace(image=photometric_augment(k_ph2, warped.image, pair_phot))
    return base, warped


def _coverage_mask(
    out_hw: tuple[int, int],
    homography: jax.Array,
    crop_yx: Optional[jax.Array],
    full_hw: tuple[int, int],
) -> jax.Array:
    """Analytic warp-coverage mask — which output pixels map inside the
    source frame. Pure coordinate math (no gather): output pixel ->
    (full-frame) normalized coords -> H -> inside-[-1,1]^2 test. Used by the
    host-warp path to re-zero padding after post-warp photometric ops."""
    Hc, Wc = out_hw
    Hf, Wf = full_hw
    B = homography.shape[0]
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hc, Wc), 1)[None]
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hc, Wc), 0)[None]
    if crop_yx is not None:
        xs = xs + crop_yx[:, 1].astype(jnp.float32)[:, None, None]
        ys = ys + crop_yx[:, 0].astype(jnp.float32)[:, None, None]
    xn = -1.0 + 2.0 * xs / max(Wf - 1, 1)
    yn = -1.0 + 2.0 * ys / max(Hf - 1, 1)
    h = homography.reshape(B, 3, 3)
    d = h[:, 2, 0, None, None] * xn + h[:, 2, 1, None, None] * yn + h[:, 2, 2, None, None]
    sx = (h[:, 0, 0, None, None] * xn + h[:, 0, 1, None, None] * yn + h[:, 0, 2, None, None]) / d
    sy = (h[:, 1, 0, None, None] * xn + h[:, 1, 1, None, None] * yn + h[:, 1, 2, None, None]) / d
    eps = 1e-6
    return (
        (jnp.abs(sx) <= 1.0 + eps) & (jnp.abs(sy) <= 1.0 + eps)
    ).astype(jnp.float32)


def _views_from_precomputed(
    key, images, points, point_mask, boxes, box_mask, config, pre,
    crop_yx=None, mosaic: bool = False,
) -> tuple[AugmentedView, AugmentedView]:
    """Assemble (base, warped) views when the loader host-warped the images
    (see `build_training_views` docstring and `data.host_augment`)."""
    B, Hf, Wf, _ = images.shape
    k_ph_light, k_ph1, k_ph2 = jax.random.split(key, 3)

    phot_cfg = (config.get("photometric") or {})
    phot_params = phot_cfg.get("params") or {}
    phot_light = phot_cfg.get("params_light")
    phot_enabled = bool(phot_cfg.get("enable", False))
    hom_cfg = (config.get("homographic") or {})

    crop_hw = None
    if crop_yx is not None:
        crop_hw = (Hf // 2, Wf // 2) if mosaic \
            else tuple(hom_cfg.get("cropHW") or (Hf, Wf))

    def as_float(img):
        return img.astype(jnp.float32) / 255.0 if img.dtype == jnp.uint8 else img

    h1 = pre["h1"].astype(jnp.float32)
    h2 = pre["h2"].astype(jnp.float32)
    h12 = jnp.matmul(h1, h2, precision=HI)

    base = homographic_augment(
        None, images, points, point_mask, boxes, box_mask,
        homography=h1, crop_yx=crop_yx, crop_hw=crop_hw,
        warped_image=as_float(pre["image_base"]),
        warped_valid=pre["valid_base"].astype(jnp.float32),
    )
    warped = homographic_augment(
        None, images, points, point_mask, boxes, box_mask,
        homography=h12, crop_yx=crop_yx, crop_hw=crop_hw,
        warped_image=as_float(pre["image_pair"]),
        warped_valid=pre["valid_pair"].astype(jnp.float32),
    )
    warped = warped._replace(homography=h2, inv_homography=jnp.linalg.inv(h2))

    if phot_enabled:
        out_hw = crop_hw or (Hf, Wf)
        if crop_yx is not None:
            big1 = crop_conjugate_homography(h1, crop_yx, crop_hw, (Hf, Wf))
            big12 = crop_conjugate_homography(h12, crop_yx, crop_hw, (Hf, Wf))
            cov_b = _coverage_mask(out_hw, big1, crop_yx, (Hf, Wf))
            cov_p = _coverage_mask(out_hw, big12, crop_yx, (Hf, Wf))
        else:
            cov_b = _coverage_mask(out_hw, h1, None, (Hf, Wf))
            cov_p = _coverage_mask(out_hw, h12, None, (Hf, Wf))
        b_img, p_img = base.image, warped.image
        if phot_light is not None:
            # the reference applies ONE shared light pass to the pre-warp
            # image (`DataClasses.py:211-218`); same key -> same params here
            b_img = photometric_augment(k_ph_light, b_img, phot_light, cov_b)
            p_img = photometric_augment(k_ph_light, p_img, phot_light, cov_p)
        pair_phot = ((config.get("warped_pair") or {}).get("photometric") or {}) \
            .get("params") or phot_params
        # blur-type ops use the coverage as a support mask (normalized conv)
        # so padding can't smear inward; pointwise ops commute with the warp
        b_img = photometric_augment(k_ph1, b_img, phot_params, cov_b) * cov_b[..., None]
        p_img = photometric_augment(k_ph2, p_img, pair_phot, cov_p) * cov_p[..., None]
        base = base._replace(image=b_img)
        warped = warped._replace(image=p_img)
    return base, warped
