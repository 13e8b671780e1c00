"""Host-side homographic warping for the training data path.

TPUs lower data-dependent per-pixel gathers poorly: one full-image bilinear
warp of a (32, 640, 640, 3) batch costs ~0.9 s of device time, and the
(base, warped-pair) construction needs several — the on-device augmentation
path spends ~2 s/step warping at B=32 while the double fwd+bwd needs only
~0.2 s. This module performs exactly those warps on host CPU workers with
the native C++ kernel (`native/preprocess.cc: yp_warp_perspective_f32`, an
exact twin of `ops.geometry.warp_image`), overlapped with device compute by
the loader's prefetch — the reference's own architecture
(cv2 warps on dataloader workers, `/root/reference/src/datasets/DataClasses.py:279-454`).

Division of labor:
  host   — sample h1/h2 (numpy twin sampler, flips composed into h1), warp
           base + pair images, build valid masks (warp + border + ellipse
           erosion).
  device — everything cheap and differentiable: photometric (applied AFTER
           the warp; pointwise color ops commute with bilinear resampling,
           and an analytic coverage mask re-zeroes the padding), point/box
           warps, label rasterization, losses
           (`data.augmentation._views_from_precomputed`).

Enable with `data.augmentation.host_warp: true`.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Mapping, Optional

import numpy as np

from yolopoint_tpu.data.native import warp_perspective_f32
from yolopoint_tpu.ops.homography import sample_homography_np

_NORM_SHAPE = np.array([2.0, 2.0])  # shift=-1 => homographies in [-1,1]^2


@functools.lru_cache(maxsize=8)
def _mosaic_canvas_np(full_hw: tuple[int, int], border: int = 2) -> np.ndarray:
    """numpy twin of `data.augmentation.mosaic_canvas_mask` — the loader
    thread must not dispatch device work."""
    Hf, Wf = full_hw
    m = np.ones((Hf, Wf), np.float32)
    for y in (0, Hf // 2, Hf):
        m[max(y - border, 0):min(y + border, Hf)] = 0.0
    for x in (0, Wf // 2, Wf):
        m[:, max(x - border, 0):min(x + border, Wf)] = 0.0
    return m


def _flip_h(horizontal: bool, vertical: bool) -> np.ndarray:
    f = np.eye(3, dtype=np.float64)
    if horizontal:
        f[0, 0] = -1.0
    if vertical:
        f[1, 1] = -1.0
    return f


def _sample_h(rng: np.random.Generator, params: Mapping[str, Any],
              crop_pts: Optional[dict] = None):
    p = {k: v for k, v in dict(params or {}).items() if k != "cropHW"}
    return sample_homography_np(
        _NORM_SHAPE, shift=-1.0, crop_pts=crop_pts,
        seed=int(rng.integers(2**31)), **p,
    )


def _erode(mask: np.ndarray, radius: int) -> np.ndarray:
    """cv2.erode with the device's 2r x 2r ellipse kernel — must match
    `ops.geometry.binary_erosion` (ones border, center anchor) exactly."""
    if radius <= 0:
        return mask
    from yolopoint_tpu.ops.geometry import ellipse_kernel

    k = ellipse_kernel(radius)
    try:
        import cv2

        return cv2.erode(mask.astype(np.uint8), k).astype(mask.dtype)
    except ImportError:  # numpy fallback, same ones-padding + anchor
        kh, kw = k.shape
        top, left = kh // 2, kw // 2
        padded = np.pad(
            mask, ((top, kh - 1 - top), (left, kw - 1 - left)), constant_values=1
        )
        out = np.ones_like(mask)
        for dy in range(kh):
            for dx in range(kw):
                if k[dy, dx]:
                    out = np.minimum(
                        out, padded[dy:dy + mask.shape[0], dx:dx + mask.shape[1]]
                    )
        return out


def _valid_mask(h: np.ndarray, hw: tuple[int, int], margin: int,
                valid_src: Optional[np.ndarray] = None) -> np.ndarray:
    """Warp-coverage validity: warped (padded) ones or `valid_src`, 1-px
    border zeroed, ellipse-eroded (`ops.geometry.compute_valid_mask` twin)."""
    H, W = hw
    if valid_src is None:
        from yolopoint_tpu.data.native import warp_coverage_f32

        m = warp_coverage_f32((H, W), h)  # == nearest warp of ones, no reads
    else:
        m = warp_perspective_f32(valid_src.astype(np.float32), h, mode="nearest")
    m[0, :] = 0; m[-1, :] = 0; m[:, 0] = 0; m[:, -1] = 0
    if valid_src is None and margin > 0:
        m = _erode(m, margin)
    return m


def _one_image(img, aug_cfg, rng_seed, crop_yx, crop_hw, mosaic_src):
    """Warp one image: returns (image_base, valid_base, image_pair,
    valid_pair, h1, h2) — the precomputed payload of one sample."""
    rng = np.random.default_rng(rng_seed)
    Hf, Wf = img.shape[:2]

    hom_cfg = aug_cfg.get("homographic") or {}
    hom_params = hom_cfg.get("params") or {}
    hom_enabled = bool(hom_cfg.get("enable", False))
    margin = int(hom_cfg.get("valid_border_margin", 0))
    warp_cfg = aug_cfg.get("warped_pair") or {}
    warp_params = warp_cfg.get("params") or hom_params
    # mosaic overrides mirror build_training_views exactly (each applied
    # independently of the other's presence)
    if mosaic_src is not None:
        if mcfg := hom_cfg.get("mosaic"):
            hom_params = mcfg.get("params") or hom_params
        if wm := warp_cfg.get("mosaic_params"):
            warp_params = wm

    # flips are COMPOSED into h1 rather than applied to the frame; in crop
    # mode this mirrors content within the crop window, which equals the
    # device path's "mirror full frame + mirror crop corner" (the window at
    # the mirrored corner of a mirrored frame IS the mirrored window), so no
    # crop_yx adjustment is needed here
    flip = np.eye(3)
    if flipping := hom_cfg.get("flipping"):
        flip = _flip_h(
            rng.random() < float(flipping.get("horizontal", 0.0)),
            rng.random() < float(flipping.get("vertical", 0.0)),
        )

    crop_pts = None
    if crop_yx is not None:
        hc, wc = crop_hw
        crop_pts = {"W_crop": wc, "H_crop": hc, "tl": (crop_yx[0], crop_yx[1]),
                    "HW_full": (Hf, Wf)}

    if hom_enabled or mosaic_src is not None:
        h1 = _sample_h(rng, hom_params, crop_pts)
        if crop_pts is not None:
            h1 = h1[0]  # (h_crop, h_big) — h_big recomputed after the flip
    else:
        h1 = np.eye(3)
    h2 = _sample_h(rng, warp_params)

    h1 = flip @ h1
    h12 = h1 @ h2

    if crop_pts is None:
        if not hom_enabled and mosaic_src is None:
            # identity base view (possibly flipped): the device
            # `_identity_view` only zeroes a 1-px border — no warp coverage
            # to compute, no erosion
            img_b = img if np.array_equal(h1, np.eye(3)) else warp_perspective_f32(img, h1)
            vm_b = np.ones((Hf, Wf), np.float32)
            vm_b[0, :] = 0; vm_b[-1, :] = 0; vm_b[:, 0] = 0; vm_b[:, -1] = 0
        else:
            img_b = warp_perspective_f32(img, h1)
            vm_b = _valid_mask(h1, (Hf, Wf), margin, mosaic_src)
        img_p = warp_perspective_f32(img, h12)
        # pair mask = base mask warped by h2, nothing more — the reference
        # neither re-zeroes nor erodes it (`DataClasses.py:417-424`), and
        # the device path matches
        vm_p = warp_perspective_f32(vm_b, h2, mode="nearest")
        return img_b, vm_b, img_p, vm_p, h1, h2

    # crop mode: conjugate each crop-frame homography into the full frame,
    # warp the full image, then crop
    hc, wc = crop_hw
    y0, x0 = int(crop_yx[0]), int(crop_yx[1])
    h1_big = _compose_crop(h1, crop_pts)
    h12_big = _compose_crop(h12, crop_pts)
    img_b = warp_perspective_f32(img, h1_big)[y0:y0 + hc, x0:x0 + wc]
    vm_b = _valid_mask(h1_big, (Hf, Wf), margin, mosaic_src)[y0:y0 + hc, x0:x0 + wc]
    if mosaic_src is not None:
        # crop+mosaic device path zeroes a 1-px frame of the cropped canvas
        # mask (`homographic_augment` crop/valid_src branch)
        vm_b = vm_b.copy()
        vm_b[0, :] = 0; vm_b[-1, :] = 0; vm_b[:, 0] = 0; vm_b[:, -1] = 0
    img_p = warp_perspective_f32(img, h12_big)[y0:y0 + hc, x0:x0 + wc]
    vm_p = warp_perspective_f32(vm_b, h2, mode="nearest")
    return img_b, vm_b, img_p, vm_p, h1, h2


def _compose_crop(h_crop: np.ndarray, crop_pts: dict) -> np.ndarray:
    """Conjugate a crop-frame normalized homography into the full frame —
    numpy twin of `data.augmentation.crop_conjugate_homography`
    (`C @ H @ C^-1`, identical normalization)."""
    Hc, Wc = crop_pts["H_crop"], crop_pts["W_crop"]
    Hf, Wf = crop_pts["HW_full"]
    ty, tx = crop_pts["tl"]
    C = np.array([
        [Wc / Wf, 0.0, (2.0 * tx + Wc) / Wf - 1.0],
        [0.0, Hc / Hf, (2.0 * ty + Hc) / Hf - 1.0],
        [0.0, 0.0, 1.0],
    ])
    return C @ h_crop @ np.linalg.inv(C)


def host_warp_views(
    batch: Mapping[str, np.ndarray],
    aug_config: Mapping[str, Any],
    rng: np.random.Generator,
    executor: Optional[ThreadPoolExecutor] = None,
) -> dict:
    """Add the precomputed-warp payload to a collated batch.

    The returned dict carries the original batch plus
    `precomputed_{image_base, valid_base, image_pair, valid_pair, h1, h2}`
    consumed by `build_training_views(..., precomputed=...)`.
    """
    images = np.asarray(batch["image"])
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    else:
        images = images.astype(np.float32, copy=False)
    B, Hf, Wf = images.shape[:3]
    mosaic = "mosaic_crop_yx" in batch
    crop_yx = batch.get("mosaic_crop_yx", batch.get("crop_yx"))
    crop_hw = None
    if crop_yx is not None:
        hom_cfg = aug_config.get("homographic") or {}
        crop_hw = (Hf // 2, Wf // 2) if mosaic \
            else tuple(hom_cfg.get("cropHW") or (Hf, Wf))

    mosaic_src = _mosaic_canvas_np((Hf, Wf)) if mosaic else None

    seeds = rng.integers(2**31, size=B)
    args = [
        (images[i], aug_config, int(seeds[i]),
         None if crop_yx is None else np.asarray(crop_yx[i]),
         crop_hw, mosaic_src)
        for i in range(B)
    ]
    if executor is not None:
        results = list(executor.map(lambda a: _one_image(*a), args))
    else:
        results = [_one_image(*a) for a in args]

    def to_u8(img):
        # u8 payload: 4x less host->device transfer; the reference's cv2
        # warps quantize to u8 identically
        return np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)

    out = dict(batch)
    # the device step only reads batch["image"].shape in precomputed mode —
    # ship a zero-channel stub (0 bytes) instead of the f32 frames
    out["image"] = np.zeros((B, Hf, Wf, 0), np.uint8)
    out["precomputed_image_base"] = np.stack([to_u8(r[0]) for r in results])
    out["precomputed_valid_base"] = np.stack([r[1] for r in results]).astype(np.uint8)
    out["precomputed_image_pair"] = np.stack([to_u8(r[2]) for r in results])
    out["precomputed_valid_pair"] = np.stack([r[3] for r in results]).astype(np.uint8)
    out["precomputed_h1"] = np.stack([r[4] for r in results]).astype(np.float32)
    out["precomputed_h2"] = np.stack([r[5] for r in results]).astype(np.float32)
    return out
