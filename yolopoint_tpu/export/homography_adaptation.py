"""Homographic-adaptation pseudo-label export (self-supervision unlock).

Re-design of `/root/reference/src/export_homography.py:23-178` +
`_do_homographic_adaptation` (`/root/reference/src/datasets/DataClasses.py:456-489`):
for each image, N random homographies (first = identity), forward the warped
stack, mask + inverse-warp each heatmap back, aggregate by masked sum /
mask-sum, then keypoint NMS + top-K.

Here the ENTIRE adaptation — homography sampling, warping the N views,
forward, heatmap decode, inverse warp, aggregation, NMS, top-K — is one
jitted device program per image; the host loop only does IO (.npz writing,
same schema `{"pts": (K, 3) [x, y, prob]}` so exported labels feed either
framework).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolopoint_tpu.ops.geometry import compute_valid_mask, warp_image
from yolopoint_tpu.ops.heatmap import cells_to_heatmap
from yolopoint_tpu.ops.homography import sample_homography_batch
from yolopoint_tpu.ops.keypoints import extract_keypoints


def homography_adaptation_batch(
    model,
    variables: Mapping[str, Any],
    image: jax.Array,
    key: jax.Array,
    num_homographies: int = 100,
    conf_thresh: float = 0.015,
    nms_radius: int = 4,
    top_k: int = 1000,
    hom_params: Optional[Mapping[str, Any]] = None,
    erosion_radius: int = 3,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Aggregate keypoint heatmaps over N warped views of one image.

    Args:
      image: `(H, W, C)` float image.
      num_homographies: N views (first is identity,
        `DataClasses.py:463`).

    Returns:
      (points (top_k, 2), scores (top_k,), valid (top_k,)).
    """
    H, W, C = image.shape
    Hs = sample_homography_batch(key, num_homographies - 1, **dict(hom_params or {}))
    eye = jnp.eye(3, dtype=Hs.dtype)[None]
    Hs = jnp.concatenate([eye, Hs], axis=0)  # (N, 3, 3)
    inv_Hs = jnp.linalg.inv(Hs)

    imgs = warp_image(jnp.broadcast_to(image, (num_homographies, H, W, C)), Hs)
    masks = compute_valid_mask((H, W), Hs, erosion_radius=erosion_radius)

    out = model.apply(variables, imgs, train=False)
    heat = cells_to_heatmap(out["semi"].astype(jnp.float32))  # (N, H, W)

    heat = heat * masks
    # unwarp each view's heatmap & mask back to the base frame
    heat_un = warp_image(heat[..., None], inv_Hs)[..., 0]
    mask_un = warp_image(masks[..., None], inv_Hs)[..., 0]

    agg = heat_un.sum(axis=0) / jnp.maximum(mask_un.sum(axis=0), 1e-6)
    pts, scores, valid = extract_keypoints(agg[None], conf_thresh, nms_radius, top_k)
    return pts[0], scores[0], valid[0]


def export_pseudo_labels(
    model,
    variables: Mapping[str, Any],
    images: Mapping[str, np.ndarray],
    output_dir: str | Path,
    seed: int = 0,
    normalize_points: bool = False,
    **ha_kwargs,
) -> list[Path]:
    """Run adaptation over named images and save `{name}.npz` with
    `pts (K, 3) [x, y, prob]` (the reference export schema,
    `export_homography.py:171-177`)."""
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)

    run = jax.jit(
        functools.partial(homography_adaptation_batch, model, variables, **ha_kwargs)
    )

    paths = []
    for i, (name, img) in enumerate(images.items()):
        k = jax.random.fold_in(key, i)
        pts, scores, valid = run(jnp.asarray(img, jnp.float32), k)
        pts, scores, valid = map(np.asarray, (pts, scores, valid))
        keep = valid
        arr = np.concatenate([pts[keep], scores[keep, None]], axis=1)
        if normalize_points:
            h, w = img.shape[:2]
            arr[:, 0] /= w
            arr[:, 1] /= h
        p = out_dir / f"{name}.npz"
        np.savez_compressed(p, pts=arr)
        paths.append(p)
    return paths
