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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10_000_000


def _kernel(hom_ref, img_ref, out_ref, *, H, W, BH, C, mode):
    """One (image, row-block) per program.

    hom_ref: (1, 9) f32 SMEM pixel-frame homography (output -> source).
    img_ref: (C, H, W) bf16 source image planes (VMEM resident).
    out_ref: (C, BH, W) f32 output row-block. (An earlier (C, M, 1) column
      layout tiled to T(8,128) on HBM — the trailing singleton padded x128,
      turning a 157 MB buffer into 20 GB at (32, 640, 640, 3).)
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
        out_ref[c] = jnp.sum((wx * interp_y).astype(jnp.float32),
                             axis=1).reshape(BH, W)


def _pick_bh(H: int, W: int, C: int) -> int:
    """Largest row-block whose VMEM working set fits the budget.

    Only multiples of 8 qualify: the output block is (C, bh, W) and Mosaic
    requires the second-minor block dim to be 8-aligned (or the full dim).
    Shapes where no such block fits (e.g. 480x640+) gate to the XLA path."""
    img_bytes = C * H * W * 2 * 2                 # bf16 planes, double-buffered
    for bh in (32, 16, 8):
        if H % bh:
            continue
        M = bh * W
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
        out_specs=pl.BlockSpec((None, C, bh, W), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
    )(hom_pix, img_t)
    return jnp.transpose(out, (0, 2, 3, 1))


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


# ---------------------------------------------------------------------------
# windowed warp: big images (480x640+), where neither the full-image VMEM
# residency nor the O(HW * (H + W)) FLOP cost of the dense formulation above
# scales. Per (8, 128) output tile the source taps live in a small window
# (homographies are smooth), so:
#   * the XLA side maps each tile's corners through the pixel-frame
#     homography and emits per-tile window origins (snapped to sublane/lane
#     granularity) as scalar-prefetch tables,
#   * the kernel DMAs the (C, WH, WW) source window HBM->VMEM at its dynamic
#     origin and runs the same tent-weight matmuls in window-local
#     coordinates.
# FLOPs drop from 2*HW*(H*W)*C to 2*HW*(WH*WW)*C per image — at 640x640 and
# the default window that is ~12x — and the image no longer needs to be
# VMEM-resident. Exactness: identical to the dense kernel for any
# homography whose per-tile source extent fits the window (set by
# `max_scale`, the out->src local expansion bound; training-augmentation
# warps are patch_ratio-contracting, comfortably inside the 1.6 default).
# Pixels whose taps fall outside the window come back 0, exactly like
# out-of-image taps — a documented approximation for extreme perspectives.
# ---------------------------------------------------------------------------

_TILE_H, _TILE_W = 16, 128


def _window_dims(H: int, W: int, max_scale: float) -> tuple[int, int]:
    """Static source-window dims covering any tile warped by <= max_scale."""
    diag = float(np.hypot(_TILE_H, _TILE_W))
    ext = int(np.ceil(diag * max_scale + 4.0))    # +bilinear margin
    wh = min(-(-(ext + 8) // 8) * 8, H)           # +sublane snap slack
    ww = min(-(-(ext + 128) // 128) * 128, W)     # +lane snap slack
    return wh, ww


def _wkernel(oy_ref, ox_ref, hom_ref, img_ref, out_ref, win, sem,
             *, WH, WW, C, mode, nty, ntx):
    """One (image, tile-row, tile-col) per program.

    oy_ref/ox_ref: (B*nty*ntx,) int32 scalar-prefetch window origins,
      FLATTENED (a 3-D SMEM array lane-pads its minor dim ~26x) and in
      sublane/lane-TILE units — rescaling by 8/128 here gives Mosaic a
      divisibility proof for the dynamic slice (a masked int32 doesn't).
    hom_ref: (1, 9) f32 SMEM pixel-frame homography (output -> source).
    img_ref: (B, C, W/128, H, 128) bf16 COLUMN-TILE-MAJOR image, HBM-resident
      (ANY memory space). The lane-tile-major relayout makes each window
      NW*C contiguous (WH, 128) slabs — DMA'ing windows out of the plain
      (H, W) layout decomposes into ~WH*C tiny row segments per tile, whose
      descriptor overhead dominated the whole kernel (measured 431 of
      687 ms).
    out_ref: (C, TILE_H, TILE_W) f32 output tile.
    win:     (2, C, NW, WH, 128) bf16 VMEM scratch — double-buffered source
      windows, NW = WW/128 column tiles.
    """
    NW = WW // 128
    b, ty, tx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    t = (b * nty + ty) * ntx + tx
    n_tiles = pl.num_programs(0) * nty * ntx

    def start_fetch(tile, slot):
        """DMA tile's window into win[slot] (indices from the flat tables)."""
        oy = oy_ref[tile] * 8
        oxt = ox_ref[tile]                        # column-TILE units
        bb = tile // (nty * ntx)
        pltpu.make_async_copy(
            img_ref.at[bb, :, pl.ds(oxt, NW), pl.ds(oy, WH), :],
            win.at[slot], sem.at[slot]).start()

    # double-buffered windows: program t computes on slot t%2 (fetched by
    # program t-1, or by itself when t==0) while prefetching t+1's window —
    # the serialized DMA latency otherwise dominates (measured 2.4x)
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        start_fetch(t, slot)

    @pl.when(t + 1 < n_tiles)
    def _():
        start_fetch(t + 1, 1 - slot)

    TH, TW = _TILE_H, _TILE_W
    oy = oy_ref[t] * 8
    oxt = ox_ref[t]
    ox = oxt * 128
    # coordinate math directly in (M, 1) column layout — the weights are
    # consumed as (M, src) matmul operands and Mosaic cannot shape-cast a
    # packed (TH, TW) register tile into a column
    M = TH * TW
    p = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    i = ((p // TW) + ty * TH).astype(jnp.float32)
    j = ((p % TW) + tx * TW).astype(jnp.float32)
    h = [hom_ref[0, k] for k in range(9)]
    inv_d = 1.0 / (h[6] * j + h[7] * i + h[8])
    # window-local source coords; out-of-image taps land outside [0, WH/WW)
    # where the tent weights vanish -> zero padding for free
    sx_col = (h[0] * j + h[1] * i + h[2]) * inv_d - ox.astype(jnp.float32)
    sy_col = (h[3] * j + h[4] * i + h[5]) * inv_d - oy.astype(jnp.float32)

    # weights built directly in the (M, src) matmul layout: 2-D iotas and a
    # (M, 1)-broadcast of the source coords (3-D (TH, TW, WH) temporaries +
    # a post-hoc reshape measured ~3x slower on the VPU)
    yy = jax.lax.broadcasted_iota(jnp.int32, (M, WH), 1).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (M, WW), 1).astype(jnp.float32)
    if mode == "nearest":
        wy = (yy == jnp.floor(sy_col + 0.5)).astype(jnp.bfloat16)
        wx = (xx == jnp.floor(sx_col + 0.5)).astype(jnp.bfloat16)
    else:
        wy = jnp.maximum(1.0 - jnp.abs(yy - sy_col), 0.0).astype(jnp.bfloat16)
        wx = jnp.maximum(1.0 - jnp.abs(xx - sx_col), 0.0).astype(jnp.bfloat16)
    # wait on this tile's slot (same descriptor the producer started)
    bb = t // (nty * ntx)
    pltpu.make_async_copy(
        img_ref.at[bb, :, pl.ds(oxt, NW), pl.ds(oy, WH), :],
        win.at[slot], sem.at[slot]).wait()
    for c in range(C):
        # per column-tile matmuls, accumulated in (M, 128) lane space; one
        # final cross-lane reduce per channel
        acc = jnp.zeros((M, 128), jnp.float32)
        for k in range(NW):
            interp_y = jax.lax.dot_general(
                wy, win[slot, c, k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)                # (M, 128) values at (sy, x)
            acc = acc + (wx[:, k * 128:(k + 1) * 128]
                         * interp_y).astype(jnp.float32)
        out_ref[c] = jnp.sum(acc, axis=1).reshape(TH, TW)


def warp_fits_windowed(shape, mode: str = "bilinear") -> bool:
    B, H, W, C = shape
    return C <= 4 and H % _TILE_H == 0 and W % _TILE_W == 0


@functools.partial(jax.jit,
                   static_argnames=("mode", "max_scale", "interpret"))
def _warp_pallas_windowed(img_t, hom_pix, mode, max_scale, interpret=False):
    B, C, H, W = img_t.shape
    WH, WW = _window_dims(H, W, max_scale)
    nty, ntx = H // _TILE_H, W // _TILE_W

    # per-tile source bounding boxes from the 4 tile corners (projective maps
    # attain coordinate extrema near rectangle corners; the window's +margin
    # absorbs the mild edge bulge of small perspective terms)
    cy = jnp.array([0.0, 0.0, _TILE_H - 1.0, _TILE_H - 1.0], jnp.float32)
    cx = jnp.array([0.0, _TILE_W - 1.0, 0.0, _TILE_W - 1.0], jnp.float32)
    ti = (jnp.arange(nty, dtype=jnp.float32) * _TILE_H)[:, None, None]
    tj = (jnp.arange(ntx, dtype=jnp.float32) * _TILE_W)[None, :, None]
    ci = ti + cy[None, None, :]                   # (nty, 1, 4)
    cj = tj + cx[None, None, :]                   # (1, ntx, 4)
    h = hom_pix.reshape(B, 9)

    def corners(hrow):
        d = hrow[6] * cj + hrow[7] * ci + hrow[8]
        inv = 1.0 / d
        sx = (hrow[0] * cj + hrow[1] * ci + hrow[2]) * inv
        sy = (hrow[3] * cj + hrow[4] * ci + hrow[5]) * inv
        return sx, sy                             # (nty, ntx, 4)

    sx, sy = jax.vmap(corners)(h)                 # (B, nty, ntx, 4)
    oy = jnp.floor(sy.min(-1)).astype(jnp.int32) - 1
    ox = jnp.floor(sx.min(-1)).astype(jnp.int32) - 1
    # snapped-to-tile origins, prefetched in TILE units (kernel rescales),
    # flattened to 1-D for SMEM
    oy = (jnp.clip(oy, 0, H - WH) // 8).reshape(-1)
    ox = (jnp.clip(ox, 0, W - WW) // 128).reshape(-1)

    kernel = functools.partial(_wkernel, WH=WH, WW=WW, C=C, mode=mode,
                               nty=nty, ntx=ntx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nty, ntx),
        in_specs=[
            pl.BlockSpec((None, 1, 9), lambda b, ty, tx, *_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (None, C, _TILE_H, _TILE_W),
            lambda b, ty, tx, *_: (b, 0, ty, tx)),
        scratch_shapes=[
            pltpu.VMEM((2, C, WW // 128, WH, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # column-tile-major relayout (see _wkernel docstring): windows become
    # NW*C contiguous slabs instead of ~WH*C row segments
    img_tiled = jnp.transpose(
        img_t.reshape(B, C, H, W // 128, 128), (0, 1, 3, 2, 4))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
    )(oy, ox, hom_pix, img_tiled)
    return jnp.transpose(out, (0, 2, 3, 1))


def warp_image_pallas_windowed(
    img: jax.Array,
    homography_inv: jax.Array,
    mode: str = "bilinear",
    max_scale: float = 1.6,
    interpret: bool = False,
) -> jax.Array:
    """Windowed-DMA MXU warp for big shapes (same convention as
    `warp_image_pallas`; exact within the `max_scale` out->src expansion
    bound, zero outside)."""
    if img.ndim == 3:
        img = img[None]
    B, H, W, C = img.shape
    Hm = jnp.broadcast_to(
        jnp.atleast_3d(homography_inv).reshape(-1, 3, 3), (B, 3, 3))
    hom_pix = jax.vmap(lambda h: _pixel_frame_homography(h, H, W))(Hm)
    img_t = jnp.transpose(img, (0, 3, 1, 2)).astype(jnp.bfloat16)
    return _warp_pallas_windowed(img_t, hom_pix.reshape(B, 1, 9), mode,
                                 float(max_scale),
                                 interpret=interpret).astype(img.dtype)


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
