"""Random homography sampling + 4-point perspective solve.

Re-design of `/root/reference/src/utils/homographies.py:13-145`
(`sample_homography`): a SuperPoint-style random patch homography. Two
implementations:

* `sample_homography_np` — host-side numpy, semantics-faithful to the
  reference (incl. the crop-aware `homography_big` second output and the
  per-index val seeding), for the host data pipeline and parity tests.
* `sample_homography_batch` — batched, fixed-shape `jax.random` version used
  for on-device augmentation inside the train step (the reference samples
  per-image on CPU dataloader workers; we generate a whole batch of
  homographies on device — SURVEY.md §7 design stance).

The 4-point solve (`perspective_transform`) replaces
`cv2.getPerspectiveTransform`: an 8x8 linear system solved with
`jnp.linalg.solve` (batched).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _perspective_system(src, dst, xp):
    """Build the 8x8 DLT system rows for H @ src ~ dst. src/dst: (..., 4, 2)."""
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = xp.zeros_like(x)
    ones = xp.ones_like(x)
    rows_u = xp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    rows_v = xp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = xp.concatenate([rows_u, rows_v], axis=-2)  # (..., 8, 8)
    b = xp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    return A, b


def perspective_transform(src: jax.Array, dst: jax.Array) -> jax.Array:
    """3x3 homography mapping 4 src points to 4 dst points (batched).

    Args:
      src, dst: `(..., 4, 2)` point quads (x, y).

    Returns:
      `(..., 3, 3)` H with H[2,2] = 1, such that H @ (x, y, 1) ~ (u, v, 1).

    Replaces `cv2.getPerspectiveTransform`
    (`/root/reference/src/utils/homographies.py:120`).
    """
    A, b = _perspective_system(src, dst, jnp)
    h = jnp.linalg.solve(A, b)[..., 0]  # (..., 8)
    ones = jnp.ones(h.shape[:-1] + (1,), h.dtype)
    return jnp.concatenate([h, ones], axis=-1).reshape(h.shape[:-1] + (3, 3))


def perspective_transform_np(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Host-side 4-point homography solve (float64)."""
    A, b = _perspective_system(np.asarray(src, np.float64), np.asarray(dst, np.float64), np)
    h = np.linalg.solve(A, b)[..., 0]
    return np.concatenate([h, np.ones(h.shape[:-1] + (1,))], axis=-1).reshape(
        h.shape[:-1] + (3, 3)
    )


def _truncnorm(rng: np.random.Generator, scale: float, size, bound: float = 2.0) -> np.ndarray:
    """Truncated normal in [-bound, bound] sigma via rejection (host-side)."""
    out = rng.standard_normal(size)
    bad = np.abs(out) > bound
    while bad.any():
        out[bad] = rng.standard_normal(int(bad.sum()))
        bad = np.abs(out) > bound
    return out * scale


def sample_homography_np(
    shape,
    shift: float = 0.0,
    perspective: bool = True,
    scaling: bool = True,
    rotation: bool = True,
    translation: bool = True,
    n_scales: int = 5,
    n_angles: int = 25,
    scaling_amplitude: float = 0.1,
    perspective_amplitude_x: float = 0.1,
    perspective_amplitude_y: float = 0.1,
    patch_ratio: float = 1.0,
    max_angle: float = math.pi / 2,
    allow_artifacts: bool = False,
    translation_overflow: float = 0.0,
    crop_pts: dict | None = None,
    seed: int | None = None,
):
    """Sample a random valid homography (host-side numpy).

    Maps output (warped patch) points to input (original patch) points: the
    original patch starts as a `patch_ratio` centered crop of the unit square
    and is perturbed by perspective, scale, translation and rotation, with
    border-validity candidate filtering unless `allow_artifacts`.

    Args mirror `/root/reference/src/utils/homographies.py:13-145`; `shape` is
    (H, W) of the target frame (the reference convention: corners scaled by
    `shape[::-1]` then shifted — pass `shape=(2, 2), shift=-1` for
    normalized [-1, 1] homographies). With `crop_pts` (keys `tl`, `H_crop`,
    `W_crop`, `HW_full`) also returns `homography_big` mapping the full
    (uncropped) frame, used for KITTI crop training.

    Returns:
      `(3, 3)` float64 H, or `(H, H_big)` when `crop_pts` is given.
    """
    rng = np.random.default_rng(seed)
    pts1 = np.stack([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]], axis=0)
    margin = (1 - patch_ratio) / 2
    pts2 = margin + np.array(
        [[0, 0], [0, patch_ratio], [patch_ratio, patch_ratio], [patch_ratio, 0]], dtype=np.float64
    )

    if perspective:
        if not allow_artifacts:
            perspective_amplitude_x = min(perspective_amplitude_x, margin)
            perspective_amplitude_y = min(perspective_amplitude_y, margin)
        persp_disp = _truncnorm(rng, perspective_amplitude_y / 2, 1)
        h_left = _truncnorm(rng, perspective_amplitude_x / 2, 1)
        h_right = _truncnorm(rng, perspective_amplitude_x / 2, 1)
        pts2 += np.array(
            [
                [h_left, persp_disp],
                [h_left, -persp_disp],
                [h_right, persp_disp],
                [h_right, -persp_disp],
            ]
        ).squeeze(-1)

    if scaling:
        scales = np.concatenate([[1.0], 1.0 + _truncnorm(rng, scaling_amplitude / 2, n_scales)])
        center = pts2.mean(axis=0, keepdims=True)
        scaled = (pts2 - center)[None] * scales[:, None, None] + center
        if allow_artifacts:
            valid = np.arange(n_scales)
        else:
            ok = ((scaled >= 0.0) & (scaled < 1.0)).all(axis=(1, 2))
            valid = np.where(ok)[0]
        idx = valid[rng.integers(len(valid))]
        pts2 = scaled[idx]

    if translation:
        t_min, t_max = pts2.min(axis=0), (1 - pts2).min(axis=0)
        if allow_artifacts:
            t_min = t_min + translation_overflow
            t_max = t_max + translation_overflow
        pts2 += np.array(
            [rng.uniform(-t_min[0], t_max[0]), rng.uniform(-t_min[1], t_max[1])]
        )

    if rotation:
        angles = np.concatenate([np.linspace(-max_angle, max_angle, n_angles), [0.0]])
        center = pts2.mean(axis=0, keepdims=True)
        rot = np.stack(
            [np.cos(angles), -np.sin(angles), np.sin(angles), np.cos(angles)], axis=1
        ).reshape(-1, 2, 2)
        rotated = (pts2 - center)[None] @ rot + center
        if allow_artifacts:
            valid = np.arange(n_angles)
        else:
            ok = ((rotated >= 0.0) & (rotated < 1.0)).all(axis=(1, 2))
            valid = np.where(ok)[0]
        idx = valid[rng.integers(len(valid))]
        pts2 = rotated[idx]

    wh = np.asarray(shape, np.float64)[::-1]
    pts1_px = pts1 * wh[None, :] + shift
    pts2_px = pts2 * wh[None, :] + shift
    homography = perspective_transform_np(pts1_px, pts2_px)

    if crop_pts is not None:
        # compose the patch homography with the full-frame -> crop transform
        # (reference homographies.py:129-143, KITTI crop training)
        W, Hc = crop_pts["W_crop"], crop_pts["H_crop"]
        tl = np.array(crop_pts["tl"], np.float64)
        corners_yx = np.array([tl, tl + [Hc, 0], tl + [Hc, W], tl + [0, W]], np.float64)
        corners_norm = corners_yx / np.asarray(crop_pts["HW_full"], np.float64) * 2 - 1
        H_32_1 = perspective_transform_np(pts1_px, corners_norm)
        pts2_h = np.concatenate([pts2_px, np.ones((4, 1))], axis=1)
        pts42 = (H_32_1 @ pts2_h.T).T
        pts42 = pts42[:, :2] / pts42[:, 2:]
        homography_big = perspective_transform_np(
            corners_norm[:, ::-1].copy(), pts42[:, ::-1].copy()
        )
        return homography, homography_big

    return homography


def sample_homography_batch(
    key: jax.Array,
    batch: int,
    perspective: bool = True,
    scaling: bool = True,
    rotation: bool = True,
    translation: bool = True,
    n_scales: int = 5,
    n_angles: int = 25,
    scaling_amplitude: float = 0.1,
    perspective_amplitude_x: float = 0.1,
    perspective_amplitude_y: float = 0.1,
    patch_ratio: float = 1.0,
    max_angle: float = math.pi / 2,
    allow_artifacts: bool = False,
    translation_overflow: float = 0.0,
) -> jax.Array:
    """Batched on-device random homographies in normalized [-1, 1] coords.

    Same distribution family as `sample_homography_np` (truncated-normal
    perspective/scale, candidate scale/rotation selection with border-validity
    filtering, uniform translation), but fully fixed-shape `jax.random` so a
    whole batch of augmentation homographies is generated inside the jitted
    train step.

    Returns:
      `(batch, 3, 3)` float32 homographies (normalized coords, i.e. the
      reference's `shape=(2,2), shift=-1` convention).
    """
    ks = jax.random.split(key, 6)
    margin = (1 - patch_ratio) / 2
    pts1 = jnp.array(
        [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]], jnp.float32
    )
    pts2 = margin + jnp.array(
        [[0, 0], [0, patch_ratio], [patch_ratio, patch_ratio], [patch_ratio, 0]],
        jnp.float32,
    )
    pts2 = jnp.broadcast_to(pts2, (batch, 4, 2))

    if perspective:
        ax = perspective_amplitude_x if allow_artifacts else min(perspective_amplitude_x, margin)
        ay = perspective_amplitude_y if allow_artifacts else min(perspective_amplitude_y, margin)
        tn = jax.random.truncated_normal(ks[0], -2.0, 2.0, (batch, 3))
        persp = tn[:, 0] * (ay / 2)
        h_left = tn[:, 1] * (ax / 2)
        h_right = tn[:, 2] * (ax / 2)
        disp = jnp.stack(
            [
                jnp.stack([h_left, persp], -1),
                jnp.stack([h_left, -persp], -1),
                jnp.stack([h_right, persp], -1),
                jnp.stack([h_right, -persp], -1),
            ],
            axis=1,
        )
        pts2 = pts2 + disp

    def pick_valid(key, candidates):
        """Uniformly pick a border-valid candidate per batch row (Gumbel)."""
        ok = ((candidates >= 0.0) & (candidates < 1.0)).all(axis=(2, 3))  # (B, K)
        if allow_artifacts:
            ok = jnp.ones_like(ok)
        g = jax.random.gumbel(key, ok.shape)
        idx = jnp.argmax(jnp.where(ok, g, -jnp.inf), axis=1)
        return jnp.take_along_axis(candidates, idx[:, None, None, None], axis=1)[:, 0]

    if scaling:
        tn = jax.random.truncated_normal(ks[1], -2.0, 2.0, (batch, n_scales))
        scales = jnp.concatenate(
            [jnp.ones((batch, 1)), 1.0 + tn * (scaling_amplitude / 2)], axis=1
        )
        center = pts2.mean(axis=1, keepdims=True)
        scaled = (pts2 - center)[:, None] * scales[:, :, None, None] + center[:, None]
        pts2 = pick_valid(ks[2], scaled)

    if translation:
        t_min = pts2.min(axis=1)  # (B, 2)
        t_max = (1 - pts2).min(axis=1)
        if allow_artifacts:
            t_min = t_min + translation_overflow
            t_max = t_max + translation_overflow
        u = jax.random.uniform(ks[3], (batch, 2))
        t = -t_min + u * (t_max + t_min)
        pts2 = pts2 + t[:, None, :]

    if rotation:
        angles = jnp.concatenate(
            [jnp.linspace(-max_angle, max_angle, n_angles), jnp.zeros((1,))]
        )
        cos, sin = jnp.cos(angles), jnp.sin(angles)
        rot = jnp.stack([cos, -sin, sin, cos], axis=1).reshape(-1, 2, 2)  # (K, 2, 2)
        center = pts2.mean(axis=1, keepdims=True)
        rotated = jnp.einsum("bnd,kde->bkne", pts2 - center, rot) + center[:, None]
        pts2 = pick_valid(ks[4], rotated)

    # normalized [-1, 1] frame: corners * 2 - 1
    src = pts1 * 2.0 - 1.0
    dst = pts2 * 2.0 - 1.0
    return perspective_transform(jnp.broadcast_to(src, (batch, 4, 2)), dst)
