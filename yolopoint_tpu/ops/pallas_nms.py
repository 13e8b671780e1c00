"""Pallas TPU kernel: fused keypoint NMS + tile reduction.

The XLA path (`ops.keypoints`) runs ~10 full passes over the `(B, H, W)`
heatmap (separable max-pools per NMS iteration, threshold, border, tile
max/argmax) — at 640 px that is the decode HBM hot spot. This kernel streams
each row-block through VMEM ONCE (halo included) and does everything on-chip:

  threshold -> iterative window-max suppression (exact `simple_nms`
  semantics) -> border zeroing -> per-(t x t)-tile max + argmax

emitting only the `(B, H/t, W/t)` tile maxima the top-k needs (NMS survivors
are pairwise > radius apart, so one survivor per radius-sized tile — see
`extract_keypoints`). Replaces the reference's serial `nms_fast`
(`/root/reference/src/utils/utils.py:118-182`) at full fidelity with ~1.4
HBM reads of the heatmap instead of ~10.

The 3-iteration suppression has a finite influence radius of
`(2*iterations - 1) * radius` pixels, so interior rows of a block with that
much halo are exact; block edges at image borders behave like the XLA
reduce_window's -inf padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -jnp.inf


def _shift_rows(x: jax.Array, d: int, fill=NEG) -> jax.Array:
    """Shift rows by d (positive = contents move down), `fill` fill."""
    R, W = x.shape
    pad = jnp.full((abs(d), W), fill, x.dtype)
    if d > 0:
        return jnp.concatenate([pad, x[:-d]], axis=0)
    return jnp.concatenate([x[-d:], pad], axis=0)


def _shift_cols(x: jax.Array, d: int, fill=NEG) -> jax.Array:
    R, W = x.shape
    pad = jnp.full((R, abs(d)), fill, x.dtype)
    if d > 0:
        return jnp.concatenate([pad, x[:, :-d]], axis=1)
    return jnp.concatenate([x[:, -d:], pad], axis=1)


def _run_max(x: jax.Array, n: int, shift, sgn: int = -1) -> jax.Array:
    """Run max in O(log n) shifted maxes (overlapping power-of-2 runs are
    exact for max). `sgn=-1`: forward, F[i] = max(x[i..i+n-1]); `sgn=+1`:
    backward, B[i] = max(x[i-n+1..i]). Out-of-range entries read as the
    shift fill (-inf), i.e. runs clip exactly at the array edges."""
    k = 1
    F = x
    while k * 2 <= n:
        F = jnp.maximum(F, shift(F, sgn * k))
        k *= 2
    if k < n:
        F = jnp.maximum(F, shift(F, sgn * (n - k)))
    return F


def _window_max(x: jax.Array, radius: int) -> jax.Array:
    """Separable (2r+1)^2 window max with -inf edges (matches reduce_window).

    Per axis: max over [i-r, i+r] = max(B[i], F[i]) with F[i]=max(x[i..i+r])
    (forward run, length r+1) and B[i]=max(x[i-r..i]) (backward run) — both
    clip exactly at edges through the -inf shift fill, so NO guard-band
    concatenation is needed. The previous concat formulation repadded the
    640-lane rows to 768 lanes and copied the whole block twice per call;
    this one never changes the block's layout."""
    n = radius + 1

    def axis(v, shift):
        return jnp.maximum(_run_max(v, n, shift, -1), _run_max(v, n, shift, +1))

    return axis(axis(x, _shift_cols), _shift_rows)


def _nms_body(s: jax.Array, radius: int, iterations: int) -> jax.Array:
    """Exact `simple_nms` iteration semantics on a local block."""
    zeros = jnp.zeros_like(s)
    max_mask = s == _window_max(s, radius)
    for _ in range(iterations - 1):
        supp = _window_max(max_mask.astype(s.dtype), radius) > 0
        supp_scores = jnp.where(supp, zeros, s)
        new_max = supp_scores == _window_max(supp_scores, radius)
        max_mask = max_mask | (new_max & ~supp)
    return jnp.where(max_mask, s, zeros)


def _kernel(hbm_ref, out_ref, scratch, sems,
            *, H, W, BR, halo, nb, total, conf, radius, iterations, border, tile):
    b = pl.program_id(0)
    i = pl.program_id(1)
    TR = BR + 2 * halo
    lin = b * nb + i
    slot = jax.lax.rem(lin, 2)

    def src_slice(bi, ii):
        row0 = ii * BR - halo
        start = jnp.clip(row0, 0, H - TR)
        # halo and H-TR are multiples of 8; hint Mosaic's alignment
        start = pl.multiple_of(start, 8)
        return bi, start

    # double buffering: program 0 kicks off its own DMA; everyone prefetches
    # the NEXT block's rows while computing the current one
    @pl.when(lin == 0)
    def _():
        b0, s0 = src_slice(b, i)
        pltpu.make_async_copy(
            hbm_ref.at[b0, pl.ds(s0, TR), :], scratch.at[0], sems.at[0]
        ).start()

    @pl.when(lin + 1 < total)
    def _():
        nxt = lin + 1
        bn = jax.lax.div(nxt, nb)
        inn = jax.lax.rem(nxt, nb)
        b1, s1 = src_slice(bn, inn)
        pltpu.make_async_copy(
            hbm_ref.at[b1, pl.ds(s1, TR), :], scratch.at[1 - slot],
            sems.at[1 - slot],
        ).start()

    bi, start = src_slice(b, i)
    off = pl.multiple_of(i * BR - start, 8)  # interior offset inside the tile
    pltpu.make_async_copy(
        hbm_ref.at[bi, pl.ds(start, TR), :], scratch.at[slot], sems.at[slot]
    ).wait()

    s = scratch[slot]  # (TR, W)
    s = jnp.where(s >= conf, s, 0.0)
    s = _nms_body(s, radius, iterations)

    # border removal on GLOBAL coordinates
    rows = jax.lax.broadcasted_iota(jnp.int32, (TR, W), 0) + start
    cols = jax.lax.broadcasted_iota(jnp.int32, (TR, W), 1)
    ok = (
        (rows >= border) & (rows < H - border)
        & (cols >= border) & (cols < W - border)
    )
    s = jnp.where(ok, s, 0.0)

    # interior rows -> (BR/t, W/t) tile max + argmax (dy*t+dx convention,
    # identical to extract_keypoints' XLA tile reduction)
    # dynamic row offset: round-trip through the VMEM ref (pl.ds on arrays
    # doesn't lower; on refs it does)
    scratch[slot] = s
    out_ref[0] = scratch[slot, pl.ds(off, BR), :]


def _tile_reduce_in_kernel(key: jax.Array, t: int) -> jax.Array:
    """(BR, W) int32 keys -> (BR/t, W/t) per-tile max, inside the kernel.

    Mosaic lowers sublane-splitting reshapes and 2D transposes (strided
    slices and lane-splitting reshapes do NOT lower), so both axes reduce
    as reshape-split max over sublanes, the second on the transposed
    array."""
    BR, W = key.shape
    kr = key.reshape(BR // t, t, W).max(axis=1)               # (BR/t, W)
    kt = kr.T.reshape(W // t, t, BR // t).max(axis=1)         # (W/t, BR/t)
    return kt.T                                               # (BR/t, W/t)


def _kernel_keys(hbm_ref, out_ref, scratch, fscratch, sems,
                 *, H, W, BR, halo, nb, total, conf, radius, iterations,
                 border, tile):
    """Same streaming NMS as `_kernel`, but reduces each interior block to
    its (BR/t, W/t) int32 tile keys in VMEM — the full suppressed map never
    returns to HBM (209 MB written + 209 MB re-read at B=128/640px in the
    two-pass formulation; this writes 13 MB)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    TR = BR + 2 * halo
    lin = b * nb + i
    slot = jax.lax.rem(lin, 2)
    t = tile

    def src_slice(bi, ii):
        row0 = ii * BR - halo
        start = jnp.clip(row0, 0, H - TR)
        start = pl.multiple_of(start, 8)
        return bi, start

    @pl.when(lin == 0)
    def _():
        b0, s0 = src_slice(b, i)
        pltpu.make_async_copy(
            hbm_ref.at[b0, pl.ds(s0, TR), :], scratch.at[0], sems.at[0]
        ).start()

    @pl.when(lin + 1 < total)
    def _():
        nxt = lin + 1
        bn = jax.lax.div(nxt, nb)
        inn = jax.lax.rem(nxt, nb)
        b1, s1 = src_slice(bn, inn)
        pltpu.make_async_copy(
            hbm_ref.at[b1, pl.ds(s1, TR), :], scratch.at[1 - slot],
            sems.at[1 - slot],
        ).start()

    bi, start = src_slice(b, i)
    off = pl.multiple_of(i * BR - start, 8)
    pltpu.make_async_copy(
        hbm_ref.at[bi, pl.ds(start, TR), :], scratch.at[slot], sems.at[slot]
    ).wait()

    # bf16 inputs halve the HBM read; compute runs f32 (Mosaic cannot lower
    # packed-bf16 compares), via an f32 compute scratch
    s = scratch[slot].astype(jnp.float32)  # (TR, W)
    s = jnp.where(s >= conf, s, 0.0)
    s = _nms_body(s, radius, iterations)

    # dynamic interior slice via the VMEM ref (pl.ds on arrays doesn't lower)
    fscratch[0] = s
    si = fscratch[0, pl.ds(off, BR), :]                       # (BR, W)

    # border removal + key packing on GLOBAL coordinates (tiles are aligned
    # to the image origin; BR % t == 0 keeps block rows tile-aligned)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 0) + i * BR
    cols = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
    ok = (
        (rows >= border) & (rows < H - border)
        & (cols >= border) & (cols < W - border)
    )
    # key packing needs the f32 bit view; the bf16->f32 upcast is exact
    si = jnp.where(ok, si, jnp.zeros((), si.dtype)).astype(jnp.float32)

    pos_bits = max((t * t - 1).bit_length(), 1)
    pos_mask = (1 << pos_bits) - 1
    pos = (rows % t) * t + cols % t
    key = jnp.where(
        si > 0.0,
        (jax.lax.bitcast_convert_type(si, jnp.int32) & ~pos_mask) | pos,
        0,
    )
    out_ref[0] = _tile_reduce_in_kernel(key, t)


def _pick_block(H: int, t: int, radius: int, iterations: int,
                keys: bool = False) -> tuple[int, int]:
    """Row-block size + halo: the 3-iteration suppression has a finite
    influence radius of (2*iterations - 1)*radius px, rounded up to the
    sublane multiple."""
    halo = -(-((2 * iterations - 1) * radius) // 8) * 8
    # largest row block <= 256 dividing H, multiple of t, larger than halo
    for cand in range(min(256, H), 0, -1):
        # %8: sublane alignment of the dynamic interior offset (with halo%8==0
        # and H%BR==0 every slice start stays 8-aligned)
        if not (H % cand == 0 and cand % t == 0 and cand % 8 == 0
                and cand + 2 * halo <= H and cand >= halo):
            continue
        # keys kernel: the output block is (1, cand//t, W//t) — Mosaic needs
        # the block sublane dim divisible by 8 OR equal to the array dim
        # (H//t). Without this, 288px/r8 picks BR=144 -> 18 tile rows vs
        # array 36 and lowering fails (broke BENCH_r03 at KITTI shape).
        if keys and (cand // t) % 8 != 0 and cand != H:
            continue
        return cand, halo
    # image too small to block (or no tile-aligned block exists): single
    # whole-image block — output sublane dim == array dim, always legal
    return H, 0


def _run_nms_keys_kernel(
    heatmap: jax.Array,
    conf_thresh: float,
    radius: int,
    iterations: int,
    border: int,
    t: int,
    interpret: bool,
) -> jax.Array:
    """Run the fused NMS+tile-keys kernel -> `(B, H/t * W/t)` int32 keys."""
    B, H, W = heatmap.shape
    assert H % t == 0 and W % t == 0, "pad the heatmap to tile multiples"
    if heatmap.dtype not in (jnp.float32, jnp.bfloat16):
        heatmap = heatmap.astype(jnp.float32)
    BR, halo = _pick_block(H, t, radius, iterations, keys=True)
    nb = H // BR
    kernel = functools.partial(
        _kernel_keys, H=H, W=W, BR=BR, halo=halo, nb=nb, total=B * nb,
        conf=float(conf_thresh), radius=int(radius), iterations=int(iterations),
        border=int(border), tile=t,
    )
    keys = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BR // t, W // t), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // t, W // t), jnp.int32),
        scratch_shapes=[
            # bf16 heatmaps stream/DMA at half the HBM traffic; compute runs
            # f32 in its own scratch (packed-bf16 compares don't lower)
            pltpu.VMEM((2, BR + 2 * halo, W), heatmap.dtype),
            pltpu.VMEM((1, BR + 2 * halo, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(heatmap)
    return keys.reshape(B, (H // t) * (W // t))


def _run_nms_kernel(
    heatmap: jax.Array,
    conf_thresh: float,
    radius: int,
    iterations: int,
    border: int,
    t: int,
    interpret: bool,
) -> jax.Array:
    """Run the blocked NMS kernel, returning the suppressed `(B, H, W)` map."""
    B, H, W = heatmap.shape
    assert H % t == 0 and W % t == 0, "pad the heatmap to tile multiples"
    BR, halo = _pick_block(H, t, radius, iterations)
    nb = H // BR
    kernel = functools.partial(
        _kernel, H=H, W=W, BR=BR, halo=halo, nb=nb, total=B * nb,
        conf=float(conf_thresh), radius=int(radius), iterations=int(iterations),
        border=int(border), tile=t,
    )
    nmsed = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BR, W), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BR + 2 * halo, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(heatmap.astype(jnp.float32))
    return nmsed


@functools.partial(
    jax.jit,
    static_argnames=("conf_thresh", "radius", "iterations", "border", "tile",
                     "interpret"),
)
def nms_tile_reduce(
    heatmap: jax.Array,
    conf_thresh: float,
    radius: int,
    iterations: int = 3,
    border: int = 4,
    tile: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused threshold + iterative NMS + border + tile max/argmax.

    Args:
      heatmap: `(B, H, W)` float32.
      tile: tile edge (defaults to `radius`; one NMS survivor per tile).

    Returns:
      (tile_max `(B, H/t * W/t)`, tile_arg `(B, H/t * W/t)` int32) in the
      (row-tile, col-tile) scan order with `arg = dy * t + dx`.
    """
    t = tile or max(int(radius), 1)
    nmsed = _run_nms_kernel(
        heatmap, conf_thresh, radius, iterations, border, t, interpret
    )
    return _tile_reduce_window(nmsed, t)


@functools.partial(
    jax.jit,
    static_argnames=("conf_thresh", "radius", "iterations", "border", "tile",
                     "interpret"),
)
def nms_tile_keys(
    heatmap: jax.Array,
    conf_thresh: float,
    radius: int,
    iterations: int = 3,
    border: int = 4,
    tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused NMS + tile reduction to order-preserving int32 keys.

    The serving fast path: each key packs the survivor's score (top
    mantissa bits, 2^(pos_bits-23)-relative quantization: 2^-19 at t=4,
    2^-17 at t=8) and its in-tile position
    (low bits), so a single top-k over the keys yields scores, tile ids AND
    in-tile offsets with no gather. Zero keys mean an empty tile.

    Key packing AND tile reduction happen inside the streaming kernel, so
    the only HBM traffic is one read of the heatmap plus the 1/t^2-sized
    key write (the previous two-pass form wrote and re-read the full
    suppressed map).
    """
    t = tile or max(int(radius), 1)
    return _run_nms_keys_kernel(
        heatmap, conf_thresh, radius, iterations, border, t, interpret
    )


def _tile_reduce_window(nmsed: jax.Array, t: int) -> tuple[jax.Array, jax.Array]:
    """Per-(t x t)-tile max + argmax as two strided `reduce_window` passes
    (native pooling on TPU — the reshape/transpose/argmax formulation costs a
    full-map relayout, ~4 ms at B=128/640px).

    Position recovery rides the max: NMS leaves at most one survivor per
    radius-sized tile, so max over an order-preserving integer key whose low
    bits carry the in-tile offset recovers that survivor's position exactly
    (non-negative f32 bitcast to int32 is order-preserving; zeroing the low
    `pos_bits` mantissa bits cannot reorder the only nonzero vs zeros).
    """
    B, H, W = nmsed.shape
    pos_bits = max((t * t - 1).bit_length(), 1)
    pos_mask = (1 << pos_bits) - 1

    def pool(x, init):
        return jax.lax.reduce_window(
            x, init, jax.lax.max,
            window_dimensions=(1, t, t), window_strides=(1, t, t),
            padding="VALID",
        )

    tile_max = pool(nmsed, -jnp.inf)
    tile_key = _tile_keys(nmsed, t)
    tile_arg = jnp.where(tile_key > 0, tile_key & pos_mask, 0)
    n = (H // t) * (W // t)
    return tile_max.reshape(B, n), tile_arg.reshape(B, n)


def _tile_keys(nmsed: jax.Array, t: int) -> jax.Array:
    """Pool the order-preserving int32 keys: score bits with the low
    `pos_bits` mantissa bits replaced by the in-tile position. One
    reduce_window carries BOTH the (2^(pos_bits-23)-relative quantized) score and the
    argmax — `extract_keypoints` top-ks the keys directly, so no per-point
    gather is ever needed."""
    B, H, W = nmsed.shape
    pos_bits = max((t * t - 1).bit_length(), 1)
    pos_mask = (1 << pos_bits) - 1
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    pos = (ys % t) * t + xs % t  # dy * t + dx, the tile_arg convention
    key = jnp.where(
        nmsed > 0.0,
        (jax.lax.bitcast_convert_type(nmsed, jnp.int32) & ~pos_mask) | pos[None],
        0,
    )
    return jax.lax.reduce_window(
        key, jnp.iinfo(jnp.int32).min, jax.lax.max,
        window_dimensions=(1, t, t), window_strides=(1, t, t), padding="VALID",
    ).reshape(B, (H // t) * (W // t))


def pallas_available() -> bool:
    """True when a real TPU backend is present (the kernel path); CPU tests
    use the XLA path in `ops.keypoints`."""
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False
