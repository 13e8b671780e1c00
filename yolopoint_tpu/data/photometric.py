"""Batched on-device photometric augmentation.

Replaces the reference's imgaug CPU pipeline
(`/root/reference/src/utils/photometric.py:10-120`: Add, LinearContrast,
AdditiveGaussianNoise, ImpulseNoise, AddElementwise, ChannelShuffle,
MotionBlur, GaussianBlur, HSV multiply, additive ellipse shade) with jnp ops
that run on the whole batch inside the train step. Parameter names mirror the
YAML schema (`configs/coco.yaml` `data.augmentation.photometric.params`) so
reference configs work unchanged.

Images are `(B, H, W, C)` float32 in [0, 1].
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp


def _per_image_uniform(key, batch, lo, hi):
    return jax.random.uniform(key, (batch, 1, 1, 1), minval=lo, maxval=hi)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """Vectorized RGB->HSV, hue in [0, 1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    diff = maxc - minc
    s = jnp.where(maxc > 0, diff / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(diff, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(diff > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def gaussian_blur(images: jax.Array, sigma: float, truncate: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with a static kernel (per-call sigma)."""
    if sigma <= 0:
        return images
    radius = max(1, int(truncate * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    C = images.shape[-1]
    kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, C))
    out = jax.lax.conv_general_dilated(
        images, kh, (1, 1), padding=((radius, radius), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), padding=((0, 0), (radius, radius)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    return out


def additive_shade(
    key: jax.Array,
    images: jax.Array,
    nb_ellipses: int = 20,
    transparency_range=(-0.5, 0.8),
    blur_sigma: float = 50.0,
) -> jax.Array:
    """Random soft ellipse shadows (reference `additive_shade`,
    `/root/reference/src/utils/photometric.py:85-110`).

    The reference draws cv2 ellipses and blurs with a 250-350px kernel; here
    ellipses are evaluated analytically on a quarter-resolution grid, blurred
    with a smaller Gaussian and bilinearly upsampled — visually equivalent,
    fully batched.
    """
    B, H, W, C = images.shape
    hs, ws = H // 4, W // 4
    min_dim = min(hs, ws) / 4
    k_ax, k_xy, k_ang, k_tr = jax.random.split(key, 4)
    ax = jnp.maximum(
        jax.random.uniform(k_ax, (B, nb_ellipses, 2)) * min_dim, min_dim / 5
    )  # (B, E, 2) semi-axes
    cx = jax.random.uniform(k_xy, (B, nb_ellipses, 2), minval=0.15, maxval=0.85)
    centers = cx * jnp.array([ws, hs])
    ang = jax.random.uniform(k_ang, (B, nb_ellipses), maxval=jnp.pi / 2)

    xs = jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 0)

    def one(centers_i, ax_i, ang_i):
        dx = xs[None] - centers_i[:, 0, None, None]
        dy = ys[None] - centers_i[:, 1, None, None]
        ca = jnp.cos(ang_i)[:, None, None]
        sa = jnp.sin(ang_i)[:, None, None]
        u = dx * ca + dy * sa
        v = -dx * sa + dy * ca
        inside = (u / ax_i[:, 0, None, None]) ** 2 + (v / ax_i[:, 1, None, None]) ** 2 <= 1.0
        return inside.any(axis=0).astype(jnp.float32)

    mask = jax.vmap(one)(centers, ax, ang)[..., None]  # (B, hs, ws, 1)
    mask = gaussian_blur(mask, blur_sigma / 4.0)
    mask = jax.image.resize(mask, (B, H, W, 1), "bilinear")
    transparency = jax.random.uniform(
        k_tr, (B, 1, 1, 1), minval=transparency_range[0], maxval=transparency_range[1]
    )
    return jnp.clip(images * (1.0 - transparency * mask), 0.0, 1.0)


def _masked_blur(blur_fn, x: jax.Array, mask: jax.Array) -> jax.Array:
    """Normalized convolution: blur only with in-support pixels so zero
    padding outside `mask` cannot smear into the valid region (used by the
    host-warp path, where photometric runs AFTER the warp)."""
    m = mask[..., None] if mask.ndim == 3 else mask
    num = blur_fn(x * m)
    den = blur_fn(jnp.broadcast_to(m, x.shape))
    return jnp.where(m > 0, num / jnp.maximum(den, 1e-6), x)


def photometric_augment(
    key: jax.Array,
    images: jax.Array,
    params: Mapping[str, Any],
    support_mask: jax.Array | None = None,
) -> jax.Array:
    """Apply the configured photometric menu to a batch.

    `params` follows the reference YAML (`random_brightness.max_abs_change`
    etc., 0-255 scale where the reference used uint8 semantics).
    `support_mask` (`(B, H, W)` 0/1): restrict blur-type ops to in-support
    pixels via normalized convolution — pointwise ops commute with image
    warping but blurs do not, so post-warp photometric (the host-warp
    training path) passes the warp-coverage mask here.
    """
    B = images.shape[0]
    keys = iter(jax.random.split(key, 20))
    x = images

    if p := params.get("random_brightness"):
        change = p["max_abs_change"] / 255.0
        x = x + _per_image_uniform(next(keys), B, -change, change)
    if p := params.get("random_contrast"):
        lo, hi = p["strength_range"]
        alpha = _per_image_uniform(next(keys), B, lo, hi)
        x = (x - 0.5) * alpha + 0.5
    if p := params.get("additive_gaussian_noise"):
        lo, hi = p["stddev_range"]
        std = _per_image_uniform(next(keys), B, lo / 255.0, hi / 255.0)
        x = x + jax.random.normal(next(keys), x.shape) * std
    if p := params.get("additive_speckle_noise"):
        lo, hi = p["prob_range"]
        prob = _per_image_uniform(next(keys), B, lo, hi)
        u = jax.random.uniform(next(keys), x.shape[:3])[..., None]
        salt = jax.random.uniform(next(keys), x.shape[:3])[..., None] > 0.5
        x = jnp.where(u < prob, jnp.where(salt, 1.0, 0.0), x)
    if p := params.get("add_elementwise"):
        # iaa.AddElementwise: independent per-pixel offsets
        val = p.get("value", (-10, 10)) if isinstance(p, Mapping) else p
        lo, hi = (val if isinstance(val, (list, tuple)) else (-val, val))
        x = x + jax.random.uniform(next(keys), x.shape, minval=lo / 255.0, maxval=hi / 255.0)
    if p := params.get("add"):
        # iaa.Sometimes(0.5, iaa.Add(value))
        val = p.get("value", (-20, 20)) if isinstance(p, Mapping) else p
        lo, hi = (val if isinstance(val, (list, tuple)) else (-val, val))
        k1, k2 = jax.random.split(next(keys))
        do = jax.random.bernoulli(k1, 0.5, (B, 1, 1, 1))
        add = jax.random.uniform(k2, (B, 1, 1, 1), minval=lo / 255.0, maxval=hi / 255.0)
        x = jnp.where(do, x + add, x)
    if p := params.get("channel_shuffle"):
        prob = float(p) if not isinstance(p, Mapping) else float(p.get("p", 0.5))
        kd, kp = jax.random.split(next(keys))
        do = jax.random.bernoulli(kd, prob, (B,))
        perms = jax.vmap(lambda k: jax.random.permutation(k, x.shape[-1]))(
            jax.random.split(kp, B)
        )
        shuffled = jax.vmap(lambda img, pm: img[..., pm])(x, perms)
        x = jnp.where(do[:, None, None, None], shuffled, x)
    if p := params.get("motion_blur"):
        # iaa.Sometimes(0.5, MotionBlur(k)): horizontal/vertical line kernel
        ksize = int(p["max_kernel_size"]) if isinstance(p, Mapping) else int(p)
        ksize = max(3, ksize | 1)
        kd, ko = jax.random.split(next(keys))
        do = jax.random.bernoulli(kd, 0.5, (B, 1, 1, 1))
        horiz = jax.random.bernoulli(ko, 0.5, ())
        line = jnp.ones((ksize,), jnp.float32) / ksize
        r = ksize // 2

        def mb_v(t):
            kk = jnp.tile(line.reshape(-1, 1, 1, 1), (1, 1, 1, t.shape[-1]))
            return jax.lax.conv_general_dilated(
                t, kk, (1, 1), padding=((r, r), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=t.shape[-1])

        def mb_h(t):
            kk = jnp.tile(line.reshape(1, -1, 1, 1), (1, 1, 1, t.shape[-1]))
            return jax.lax.conv_general_dilated(
                t, kk, (1, 1), padding=((0, 0), (r, r)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=t.shape[-1])

        if support_mask is not None:
            blur_v = _masked_blur(mb_v, x, support_mask)
            blur_h = _masked_blur(mb_h, x, support_mask)
        else:
            blur_v, blur_h = mb_v(x), mb_h(x)
        x = jnp.where(do, jnp.where(horiz, blur_h, blur_v), x)
    if p := params.get("hsv"):
        h_amp, s_amp, v_amp = p
        kh_, ks_, kv_ = jax.random.split(next(keys), 3)
        hsv = rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
        hm = jax.random.uniform(kh_, (B, 1, 1), minval=1 - h_amp, maxval=1 + h_amp)
        sm = jax.random.uniform(ks_, (B, 1, 1), minval=1 - s_amp, maxval=1 + s_amp)
        vm = jax.random.uniform(kv_, (B, 1, 1), minval=1 - v_amp, maxval=1 + v_amp)
        hsv = jnp.stack(
            [(hsv[..., 0] * hm) % 1.0, jnp.clip(hsv[..., 1] * sm, 0, 1), jnp.clip(hsv[..., 2] * vm, 0, 1)],
            axis=-1,
        )
        x = hsv_to_rgb(hsv)
    if p := params.get("GaussianBlur"):
        sigma = p["sigma"] if isinstance(p, Mapping) else p
        # per-batch coin flip like iaa.Sometimes for blur-type augs
        do = jax.random.bernoulli(next(keys), 0.5, (B, 1, 1, 1))
        gb = lambda t: gaussian_blur(t, float(sigma))
        blurred = _masked_blur(gb, x, support_mask) if support_mask is not None else gb(x)
        x = jnp.where(do, blurred, x)
    if p := params.get("additive_shade"):
        kwargs = dict(p) if isinstance(p, Mapping) else {}
        kwargs.pop("kernel_size_range", None)
        x = additive_shade(next(keys), x, **kwargs)

    return jnp.clip(x, 0.0, 1.0)
