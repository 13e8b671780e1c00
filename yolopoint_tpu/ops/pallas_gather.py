"""Pallas TPU kernel: bilinear descriptor sampling as MXU one-hot matmuls.

XLA lowers the 4-tap bilinear gather of `ops.sampling.sample_descriptors`
((B, N) points from a (B, Hc, Wc, D) map) to per-point gathers — ~8 ms at
B=128/N=1000/D=256 for ~0.5 GB of useful traffic. On TPU the whole coarse
map fits in VMEM (80*80*256 bf16 = 3.3 MB), so sampling becomes dense
linear algebra: for a chunk of points, build the (chunk, Hc*Wc) weight
matrix W (4 bilinear taps per row, built on the fly from lane-iota
compares) and compute `W @ desc_flat` on the MXU. One HBM pass over the
descriptor maps, everything else on-chip.

Numerics: the matmul runs in bf16 with f32 accumulation — descriptor values
quantize to ~3 decimal digits, well inside matching tolerances (mutual-NN
threshold 0.7, `/root/reference/src/demo.py:333`). The XLA path
(`ops.sampling`) remains the exact f32 reference and the CPU/test path.

Replaces ATen `F.grid_sample` descriptor sampling
(`/root/reference/src/evaluations/descriptor_evaluation.py:148-181`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(desc_ref, taps_ref, w_ref, out_ref, *, P, D, NC, PB):
    """One (image, point-chunk) per program.

    desc_ref: (P, D) bf16 flattened coarse map; taps_ref: (NC, 4) int32 flat
    tap indices; w_ref: (NC, 4) f32 bilinear weights (0 for padded points /
    clamped taps); out_ref: (NC, D) f32 unit descriptors.
    """
    acc = jnp.zeros((NC, D), jnp.float32)
    nblk = P // PB
    for blk in range(nblk):
        p0 = blk * PB
        lane = (
            jax.lax.broadcasted_iota(jnp.int32, (NC, PB), 1) + p0
        ).astype(jnp.float32)
        w = jnp.zeros((NC, PB), jnp.float32)
        for t in range(4):
            tap = taps_ref[:, t : t + 1].astype(jnp.float32)     # (NC, 1)
            w = w + jnp.where(lane == tap, w_ref[:, t : t + 1], 0.0)
        acc = acc + jax.lax.dot_general(
            w.astype(jnp.bfloat16), desc_ref[pl.ds(p0, PB), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # L2 renorm (reference re-normalizes after grid_sample)
    norm2 = jnp.sum(acc * acc, axis=1, keepdims=True)
    out_ref[:, :] = acc * jax.lax.rsqrt(jnp.maximum(norm2, 1e-16))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sample_pallas(desc_flat, taps, weights, interpret=False):
    B, P, D = desc_flat.shape
    N = taps.shape[1]
    NC = 256
    nchunks = N // NC
    PB = 1280 if P % 1280 == 0 else P
    kernel = functools.partial(_kernel, P=P, D=D, NC=NC, PB=PB)
    return pl.pallas_call(
        kernel,
        grid=(B, nchunks),
        in_specs=[
            pl.BlockSpec((None, P, D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, NC, 4), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, NC, 4), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, NC, D), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.float32),
        interpret=interpret,
    )(desc_flat, taps, weights)


def sample_descriptors_pallas(
    desc: jax.Array,
    points: jax.Array,
    cell_size: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """MXU-gather version of `ops.sampling.sample_descriptors` (same
    coordinate convention: full-res pixel points, align_corners bilinear on
    the coarse map, L2 renorm)."""
    B, Hc, Wc, D = desc.shape
    _, N, _ = points.shape
    W, H = Wc * cell_size, Hc * cell_size
    xn = points[..., 0] / (W / 2.0) - 1.0
    yn = points[..., 1] / (H / 2.0) - 1.0
    cx = (xn + 1.0) * 0.5 * (Wc - 1)
    cy = (yn + 1.0) * 0.5 * (Hc - 1)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx = (cx - x0)[..., None]
    wy = (cy - y0)[..., None]
    # 4 taps (y0,x0) (y0,x0+1) (y0+1,x0) (y0+1,x0+1); out-of-range taps get
    # weight 0 (zero-padding grid_sample semantics) and a clamped index
    w4 = jnp.concatenate(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    taps_list, w_list = [], []
    for t, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xi, yi = x0i + dx, y0i + dy
        inside = (xi >= 0) & (xi < Wc) & (yi >= 0) & (yi < Hc)
        xi = jnp.clip(xi, 0, Wc - 1)
        yi = jnp.clip(yi, 0, Hc - 1)
        taps_list.append(yi * Wc + xi)
        w_list.append(jnp.where(inside, w4[..., t], 0.0))
    taps = jnp.stack(taps_list, axis=-1)                        # (B, N, 4)
    weights = jnp.stack(w_list, axis=-1).astype(jnp.float32)

    NC = 256
    pad = (-N) % NC
    if pad:
        taps = jnp.pad(taps, ((0, 0), (0, pad), (0, 0)))
        weights = jnp.pad(weights, ((0, 0), (0, pad), (0, 0)))
    desc_flat = desc.reshape(B, Hc * Wc, D).astype(jnp.bfloat16)
    out = _sample_pallas(desc_flat, taps, weights, interpret=interpret)
    return out[:, :N]


def sampling_fits_pallas(desc_shape) -> bool:
    """Kernel constraints: lane-aligned channel dim and a VMEM-resident map,
    INCLUDING the per-block (NC, PB) f32 weight intermediate — when
    P % 1280 != 0 the kernel falls back to one block of PB=P, whose weight
    matrix must also fit (a large lane-aligned coarse map could otherwise
    pass the map-size gate and fail at Mosaic compile time)."""
    _, Hc, Wc, D = desc_shape
    P = Hc * Wc
    if D % 128 != 0 or P % 128 != 0:
        return False
    PB = 1280 if P % 1280 == 0 else P
    NC = 256
    weight_bytes = NC * PB * 4          # per-block f32 weight intermediate
    map_bytes = P * D * 2               # bf16 coarse map
    return map_bytes + weight_bytes <= 6_000_000
