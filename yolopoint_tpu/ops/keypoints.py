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


def _maxpool2d(x: jax.Array, radius: int) -> jax.Array:
    """Max over a (2r+1)^2 window (∞-norm ball), SAME padding. x: (B, H, W)."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k),
        window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius)),
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
    nmsed = simple_nms(heatmap, nms_radius, nms_iterations)

    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    in_border = (
        (xs >= border) & (xs < W - border) & (ys >= border) & (ys < H - border)
    )
    masked = jnp.where(in_border[None], nmsed, 0.0)
    masked = jnp.where(masked >= conf_thresh, masked, 0.0)

    flat = masked.reshape(B, H * W)
    scores, idx = jax.lax.top_k(flat, max_k)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    points = jnp.stack([x, y], axis=-1)
    valid = scores > 0.0
    return points, scores, valid


def nms_fast_reference(in_corners, H: int, W: int, dist_thresh: int):
    """Host-side exact replica of the reference serial grid NMS — used only as
    a test oracle for `simple_nms`/`extract_keypoints` parity, never on the
    compute path.

    Args/returns follow `/root/reference/src/utils/utils.py:118-182`:
    `in_corners` is `3xN` `[x, y, conf]`, returns surviving `3xN` + indices.
    """
    import numpy as np

    grid = np.zeros((H, W), int)
    inds = np.zeros((H, W), int)
    inds1 = np.argsort(-in_corners[2, :])
    corners = in_corners[:, inds1]
    rcorners = corners[:2, :].round().astype(int)
    if rcorners.shape[1] == 0:
        return np.zeros((3, 0)).astype(int), np.zeros(0).astype(int)
    if rcorners.shape[1] == 1:
        out = np.vstack((rcorners, in_corners[2])).reshape(3, 1)
        return out, np.zeros((1,)).astype(int)
    for i in range(rcorners.shape[1]):
        grid[rcorners[1, i], rcorners[0, i]] = 1
        inds[rcorners[1, i], rcorners[0, i]] = i
    pad = dist_thresh
    grid = np.pad(grid, ((pad, pad), (pad, pad)), mode="constant")
    for i in range(rcorners.shape[1]):
        pt = (rcorners[0, i] + pad, rcorners[1, i] + pad)
        if grid[pt[1], pt[0]] == 1:
            grid[pt[1] - pad:pt[1] + pad + 1, pt[0] - pad:pt[0] + pad + 1] = 0
            grid[pt[1], pt[0]] = -1
    keepy, keepx = np.where(grid == -1)
    keepy, keepx = keepy - pad, keepx - pad
    inds_keep = inds[keepy, keepx]
    out = corners[:, inds_keep]
    inds2 = np.argsort(-out[-1, :])
    out = out[:, inds2]
    out_inds = inds1[inds_keep[inds2]]
    return out, out_inds
