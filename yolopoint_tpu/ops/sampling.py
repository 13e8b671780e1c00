"""Bilinear/nearest image sampling (the reference's `F.grid_sample` surface).

The reference leans on ATen `grid_sample` with `align_corners=True` for image
warping (`/root/reference/src/utils/utils.py:373`) and descriptor sampling
(`/root/reference/src/utils/loss_functions.py:432`,
`/root/reference/src/evaluations/descriptor_evaluation.py:173`). Here it is a
pure-jnp gather, differentiable, batched, NHWC — XLA fuses the 4-tap gather
into surrounding elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_pixels(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Gather img[b, y, x, :] with zero padding outside. img: (H, W, C)."""
    H, W, _ = img.shape
    inside = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    xc = jnp.clip(x, 0, W - 1)
    yc = jnp.clip(y, 0, H - 1)
    vals = img[yc, xc]  # (..., C)
    return jnp.where(inside[..., None], vals, 0.0)


def _sample_one(img: jax.Array, coords: jax.Array, mode: str) -> jax.Array:
    """Sample one (H, W, C) image at (..., 2) pixel coords (x, y)."""
    x, y = coords[..., 0], coords[..., 1]
    if mode == "nearest":
        # torch grid_sample nearest rounds half away from floor consistently
        # with round-to-nearest; jnp.round (banker's) differs on exact .5 only.
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        yi = jnp.floor(y + 0.5).astype(jnp.int32)
        return _gather_pixels(img, xi, yi)
    if mode != "bilinear":
        raise ValueError(f"unknown mode {mode}")
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = _gather_pixels(img, x0i, y0i)
    v01 = _gather_pixels(img, x0i + 1, y0i)
    v10 = _gather_pixels(img, x0i, y0i + 1)
    v11 = _gather_pixels(img, x0i + 1, y0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample(img: jax.Array, coords: jax.Array, mode: str = "bilinear") -> jax.Array:
    """Sample images at pixel coordinates with zero padding.

    Args:
      img: `(B, H, W, C)`.
      coords: `(B, ..., 2)` pixel coords `(x, y)` (NOT normalized — callers
        convert with align_corners semantics; see `warp_image`).
      mode: "bilinear" | "nearest".

    Returns:
      `(B, ..., C)` sampled values (zeros outside the image).
    """
    return jax.vmap(lambda im, c: _sample_one(im, c, mode))(img, coords)


def sample_descriptors(
    desc: jax.Array,
    points: jax.Array,
    cell_size: int = 8,
    normalized_points: bool = False,
) -> jax.Array:
    """Sample L2-renormalized descriptors at keypoint locations.

    The reference samples the coarse `(Hc, Wc, D)` descriptor map at full-res
    keypoint coords normalized to [-1, 1] with `align_corners=True`, then
    re-normalizes (`sample_desc_from_points`,
    `/root/reference/src/evaluations/descriptor_evaluation.py:148-181`).

    Args:
      desc: `(B, Hc, Wc, D)` descriptor maps.
      points: `(B, N, 2)` keypoint coords — full-resolution pixels `(x, y)` by
        default, or already-normalized [-1, 1] coords if `normalized_points`.
      cell_size: full-res to coarse stride (8).

    Returns:
      `(B, N, D)` unit descriptors.
    """
    B, Hc, Wc, D = desc.shape
    if normalized_points:
        xn, yn = points[..., 0], points[..., 1]
    else:
        W, H = Wc * cell_size, Hc * cell_size
        # pixel -> [-1, 1] over the *full-res* image (reference divides by
        # (W/2, H/2) then subtracts 1)
        xn = points[..., 0] / (W / 2.0) - 1.0
        yn = points[..., 1] / (H / 2.0) - 1.0
    # [-1, 1] -> coarse-map pixel coords, align_corners=True
    cx = (xn + 1.0) * 0.5 * (Wc - 1)
    cy = (yn + 1.0) * 0.5 * (Hc - 1)
    coords = jnp.stack([cx, cy], axis=-1)
    sampled = grid_sample(desc, coords)  # (B, N, D)
    norm = jnp.linalg.norm(sampled, axis=-1, keepdims=True)
    return sampled / jnp.maximum(norm, 1e-8)
