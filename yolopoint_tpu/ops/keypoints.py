"""Device-resident keypoint NMS + extraction.

The reference's `nms_fast` (`/root/reference/src/utils/utils.py:118-182`) is a
serial conf-ordered grid suppression in numpy — the #1 host-side hot spot
(SURVEY.md §2.9 item 5). Here it becomes an iterative max-pool suppression
(`simple_nms`) that is fully parallel on the VPU and converges to the same
point set, followed by fixed-K top-k extraction with border removal
(`getPtsFromHeatmap` `/root/reference/src/utils/utils.py:465-485`).

Outputs are fixed-shape: `(max_k, 2)` points + scores + validity mask instead
of ragged `3xN` arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolopoint_tpu.ops.topk import exact_top_k


def _maxpool2d(x: jax.Array, radius: int) -> jax.Array:
    """Max over a (2r+1)^2 window (∞-norm ball), SAME padding. x: (B, H, W).

    Separable: max over the square = row-max then column-max — (2r+1)+(2r+1)
    reads per element instead of (2r+1)^2; the NMS max-pool is the
    HBM-bandwidth hot spot of the decode."""
    k = 2 * radius + 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, k), window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (radius, radius)),
    )
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, 1), window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (0, 0)),
    )


def simple_nms(scores: jax.Array, radius: int, iterations: int = 3) -> jax.Array:
    """Iterative non-maximum suppression on a score map.

    Round 1 keeps strict window maxima; subsequent rounds re-admit points
    whose entire (2r+1) neighborhood was suppressed by earlier-kept maxima —
    converging to the greedy conf-ordered suppression of the reference
    `nms_fast`. Two to three iterations are enough in practice (same scheme as
    SuperGlue's `simple_nms`).

    Args:
      scores: `(B, H, W)` heatmap.
      radius: suppression radius (∞-norm), reference `nms_dist`.

    Returns:
      `(B, H, W)` scores with suppressed locations zeroed.
    """
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _maxpool2d(scores, radius)

    def body(_, max_mask):
        supp_mask = _maxpool2d(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _maxpool2d(supp_scores, radius)
        return max_mask | (new_max_mask & ~supp_mask)

    max_mask = jax.lax.fori_loop(0, iterations - 1, body, max_mask)
    return jnp.where(max_mask, scores, zeros)


def extract_keypoints(
    heatmap: jax.Array,
    conf_thresh: float,
    nms_radius: int,
    max_k: int,
    border: int = 4,
    nms_iterations: int = 3,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Threshold -> NMS -> border removal -> top-K, all on device.

    Args:
      heatmap: `(B, H, W)` probability heatmap.
      conf_thresh: detection threshold (reference `detection_threshold`).
      nms_radius: suppression radius (reference `nms`).
      max_k: fixed number of keypoints returned per image (reference `top_k`).
      border: border margin in px — points with x/y within `border` of an edge
        are removed (reference `border_remove=4`).

    Returns:
      points: `(B, max_k, 2)` float `(x, y)` pixel coords (conf-sorted desc).
      scores: `(B, max_k)` confidences.
      valid:  `(B, max_k)` bool mask (False entries are padding).

    Parity: `getPtsFromHeatmap` `/root/reference/src/utils/utils.py:465-485`
    (point *sets* match; exact ordering among equal scores may differ).
    """
    B, H, W = heatmap.shape
    t = max(int(nms_radius), 1)

    # fused Pallas path on TPU: threshold + iterative NMS + border + tile
    # reduction to packed score/position keys in a single HBM pass
    # (ops.pallas_nms); top-k over the int32 keys is order-equivalent to
    # top-k over scores and carries the in-tile argmax in its low bits, so
    # points need no per-point gather (scores exact to 2^(pos_bits-23)
    # relative: 2^-19 at radius 4, 2^-17 at radius 8).
    from yolopoint_tpu.ops.pallas_nms import nms_tile_keys, pallas_available

    # W must be lane-aligned (128) for the kernel's HBM row DMA
    if pallas_available() and H % t == 0 and W % t == 0 and H >= 4 * t \
            and W % 128 == 0:
        keys = nms_tile_keys(
            heatmap, conf_thresh, nms_radius, nms_iterations, border, t
        )
        n_tiles = keys.shape[1]
        k = min(max_k, n_tiles)
        key_k, tidx = exact_top_k(keys, k)
        pos_bits = max((t * t - 1).bit_length(), 1)
        pos_mask = (1 << pos_bits) - 1
        scores = jnp.where(
            key_k > 0,
            jax.lax.bitcast_convert_type(key_k & ~pos_mask, jnp.float32),
            0.0,
        )
        sub = jnp.where(key_k > 0, key_k & pos_mask, 0)
        ntw = W // t
        x = ((tidx % ntw) * t + sub % t).astype(jnp.float32)
        y = ((tidx // ntw) * t + sub // t).astype(jnp.float32)
        if k < max_k:
            pad_n = max_k - k
            scores = jnp.pad(scores, ((0, 0), (0, pad_n)))
            x = jnp.pad(x, ((0, 0), (0, pad_n)))
            y = jnp.pad(y, ((0, 0), (0, pad_n)))
        points = jnp.stack([x, y], axis=-1)
        return points, scores, scores > 0.0
    else:
        # XLA path (CPU tests / odd shapes)
        # threshold FIRST like the reference (`getPtsFromHeatmap` gathers
        # only >= conf pixels before nms_fast, utils.py:465-474)
        heatmap = jnp.where(heatmap >= conf_thresh, heatmap, 0.0)
        nmsed = simple_nms(heatmap, nms_radius, nms_iterations)

        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        in_border = (
            (xs >= border) & (xs < W - border) & (ys >= border) & (ys < H - border)
        )
        masked = jnp.where(in_border[None], nmsed, 0.0)

        # Exact candidate reduction before top-k: NMS survivors are pairwise
        # more than `radius` apart in inf-norm, so each (t x t) tile holds at
        # most one non-zero — reduce each tile to its max + argmax, then
        # top-k over H*W/t^2 tile maxima instead of H*W pixels (a large
        # top_k over the full map is the latency hot spot on TPU).
        Hp, Wp = -(-H // t) * t, -(-W // t) * t
        padded = jnp.pad(masked, ((0, 0), (0, Hp - H), (0, Wp - W)))
        tiles = padded.reshape(B, Hp // t, t, Wp // t, t).transpose(0, 1, 3, 2, 4)
        tiles = tiles.reshape(B, (Hp // t) * (Wp // t), t * t)
        tile_max = tiles.max(axis=-1)
        tile_arg = tiles.argmax(axis=-1).astype(jnp.int32)

    n_tiles = tile_max.shape[1]
    k = min(max_k, n_tiles)
    scores, tidx = exact_top_k(tile_max, k)
    sub = jnp.take_along_axis(tile_arg, tidx, axis=1)
    ntw = Wp // t
    x = ((tidx % ntw) * t + sub % t).astype(jnp.float32)
    y = ((tidx // ntw) * t + sub // t).astype(jnp.float32)
    if k < max_k:
        pad_n = max_k - k
        scores = jnp.pad(scores, ((0, 0), (0, pad_n)))
        x = jnp.pad(x, ((0, 0), (0, pad_n)))
        y = jnp.pad(y, ((0, 0), (0, pad_n)))
    points = jnp.stack([x, y], axis=-1)
    valid = scores > 0.0
    return points, scores, valid
