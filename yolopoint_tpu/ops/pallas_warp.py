"""Pallas TPU kernel: full-image homography warp as MXU one-hot matmuls.

XLA lowers the bilinear warp gather of `ops.geometry.warp_image` to per-pixel
arbitrary-index gathers — measured ~93 ms for a (32, 256, 320, 3) f32 batch
on v5e (~12 ns/element), which made the device-side augmentation the
dominant cost of the whole train step (the reference does these warps on CPU
workers via `F.grid_sample`, `/root/reference/src/utils/utils.py:333-376`).

TPU has no vector gather; it has a 128x128 systolic array. So the warp is
recast as dense linear algebra over VMEM-resident images:

  out[p] = sum_y sum_x  Wy[p, y] * Wx[p, x] * img[y, x]

where for bilinear sampling `Wy[p, y] = relu(1 - |sy_p - y|)` (the tent has
exactly the two bilinear taps as nonzeros, and vanishes outside the frame —
zero-padding semantics for free, with no floor() discontinuity), and for
nearest `Wy[p, y] = [y == floor(sy_p + 0.5)]`. Per (image, row-block) grid
step the kernel builds Wy (M, H) / Wx (M, W) from broadcasted iotas, runs
one (M, H) @ (H, W) MXU matmul per channel (bf16, f32 accumulation) for the
y-interpolation, and finishes the x-interpolation as a VPU weighted lane
reduce. One HBM pass over the image batch; everything else on-chip.

Numerics: weights and pixels quantize to bf16 (<=0.4% of value range —
training augmentation, valid masks and heatmap aggregation are all
insensitive at that scale); nearest mode is EXACT (0/1 weights). The XLA
path in `ops.geometry` remains the exact f32 reference and the CPU path.

Source-coordinate math runs per output pixel from the PIXEL-frame
homography (conjugated from the caller's normalized-coords convention on
the XLA side), so the only per-call inputs are the images and a (B, 9)
scalar table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10_000_000


def _kernel(hom_ref, img_ref, out_ref, *, H, W, BH, C, mode):
    """One (image, row-block) per program.

    hom_ref: (1, 9) f32 SMEM pixel-frame homography (output -> source).
    img_ref: (C, H, W) bf16 source image planes (VMEM resident).
    out_ref: (C, M, 1) f32, M = BH * W flattened output pixels p = i * W + j.
    """
    M = BH * W
    r = pl.program_id(1)
    # packed (BH, W) coordinate math (a (M, 1) column layout would waste
    # 127/128 lanes on every coordinate op)
    i = (jax.lax.broadcasted_iota(jnp.int32, (BH, W), 0)
         + r * BH).astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.int32, (BH, W), 1).astype(jnp.float32)
    h = [hom_ref[0, k] for k in range(9)]
    inv_d = 1.0 / (h[6] * j + h[7] * i + h[8])
    sx = (h[0] * j + h[1] * i + h[2]) * inv_d    # (BH, W) source pixel coords
    sy = (h[3] * j + h[4] * i + h[5]) * inv_d

    # weights as (BH, W, src) 3-D tensors; leading dims collapse to the
    # matmul's M without a relayout
    yy = jax.lax.broadcasted_iota(jnp.int32, (BH, W, H), 2).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (BH, W, W), 2).astype(jnp.float32)
    if mode == "nearest":
        # torch-style round-half-up (floor(x + 0.5)); exact 0/1 weights
        wy = (yy == jnp.floor(sy + 0.5)[..., None]).astype(jnp.bfloat16)
        wx = (xx == jnp.floor(sx + 0.5)[..., None]).astype(jnp.bfloat16)
    else:
        wy = jnp.maximum(1.0 - jnp.abs(yy - sy[..., None]), 0.0
                         ).astype(jnp.bfloat16)
        wx = jnp.maximum(1.0 - jnp.abs(xx - sx[..., None]), 0.0
                         ).astype(jnp.bfloat16)
    wy = wy.reshape(M, H)
    wx = wx.reshape(M, W)
    for c in range(C):
        interp_y = jax.lax.dot_general(
            wy, img_ref[c],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                    # (M, W) values at (sy, x)
        out_ref[c] = jnp.sum((wx * interp_y).astype(jnp.float32), axis=1,
                             keepdims=True)


def _pick_bh(H: int, W: int, C: int) -> int:
    """Largest row-block whose VMEM working set fits the budget."""
    img_bytes = C * H * W * 2 * 2                 # bf16 planes, double-buffered
    for bh in (32, 16, 8, 4, 2, 1):
        if H % bh:
            continue
        M = bh * W
        if M % 8:
            continue
        # wy bf16 + wx bf16 + interp_y bf16 + f32 product + out column
        work = M * H * 2 + M * W * (2 + 2 + 4) + M * C * 4
        if img_bytes + work <= _VMEM_BUDGET:
            return bh
    return 0


def warp_fits_pallas(shape, mode: str = "bilinear") -> bool:
    """Gate: image planes + per-block weight working set must fit VMEM."""
    B, H, W, C = shape
    return C <= 4 and _pick_bh(H, W, C) > 0


@functools.partial(jax.jit, static_argnames=("mode", "bh", "interpret"))
def _warp_pallas(img_t, hom_pix, mode, bh, interpret=False):
    B, C, H, W = img_t.shape
    M = bh * W
    kernel = functools.partial(_kernel, H=H, W=W, BH=bh, C=C, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // bh),
        in_specs=[
            pl.BlockSpec((None, 1, 9), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, C, H, W), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, C, M, 1), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H * W, 1), jnp.float32),
        interpret=interpret,
    )(hom_pix, img_t)
    return jnp.transpose(out.reshape(B, C, H, W), (0, 2, 3, 1))


def _pixel_frame_homography(hom_norm: jax.Array, H: int, W: int) -> jax.Array:
    """Conjugate normalized-coords H (output -> source, align_corners) into
    pixel coords: S^-1 @ H @ S with S: pixel -> [-1, 1]."""
    dt = jnp.float32
    hom_norm = hom_norm.astype(dt)
    sx, sy = 2.0 / max(W - 1, 1), 2.0 / max(H - 1, 1)
    S = jnp.array([[sx, 0, -1.0], [0, sy, -1.0], [0, 0, 1.0]], dt)
    S_inv = jnp.array([[1 / sx, 0, (W - 1) / 2.0],
                       [0, 1 / sy, (H - 1) / 2.0], [0, 0, 1.0]], dt)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(S_inv, hom_norm, precision=hi), S,
                      precision=hi)


def warp_image_pallas(
    img: jax.Array,
    homography_inv: jax.Array,
    mode: str = "bilinear",
    interpret: bool = False,
) -> jax.Array:
    """MXU-matmul version of `ops.geometry.warp_image` (same convention:
    normalized-coords output->source homographies, align_corners=True,
    zero padding)."""
    if img.ndim == 3:
        img = img[None]
    B, H, W, C = img.shape
    bh = _pick_bh(H, W, C)
    if bh == 0:
        raise ValueError(f"warp_image_pallas: shape {img.shape} exceeds VMEM "
                         "budget — gate with warp_fits_pallas")
    Hm = jnp.broadcast_to(
        jnp.atleast_3d(homography_inv).reshape(-1, 3, 3), (B, 3, 3))
    hom_pix = jax.vmap(lambda h: _pixel_frame_homography(h, H, W))(Hm)
    img_t = jnp.transpose(img, (0, 3, 1, 2)).astype(jnp.bfloat16)
    return _warp_pallas(img_t, hom_pix.reshape(B, 1, 9), mode, bh,
                        interpret=interpret).astype(img.dtype)
