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


def homography_adaptation_host(
    model,
    variables: Mapping[str, Any],
    image: np.ndarray,
    rng: np.random.Generator,
    num_homographies: int = 100,
    conf_thresh: float = 0.015,
    nms_radius: int = 4,
    top_k: int = 1000,
    hom_params: Optional[Mapping[str, Any]] = None,
    erosion_radius: int = 3,
    chunk: int = 25,
    homographies: Optional[np.ndarray] = None,
    _forward=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-warp homographic adaptation: the device runs ONLY the batched
    forwards; view warping, masking, inverse warping and aggregation run on
    host CPU with the native C++ warp (`data.host_augment` rationale —
    ~200 full-image gather warps per image otherwise dominate the device
    program). Heatmaps stream back per chunk and overlap with the next
    chunk's forward via async dispatch.

    Same math as `homography_adaptation_batch`; `homographies` overrides
    sampling for parity tests.
    """
    from yolopoint_tpu.data.host_augment import _NORM_SHAPE, _valid_mask
    from yolopoint_tpu.data.native import warp_perspective_f32
    from yolopoint_tpu.ops.homography import sample_homography_np

    H, W = image.shape[:2]
    image = np.asarray(image, np.float32)
    if homographies is None:
        params = {k: v for k, v in dict(hom_params or {}).items()}
        Hs = [np.eye(3)] + [
            sample_homography_np(
                _NORM_SHAPE, shift=-1.0, seed=int(rng.integers(2**31)), **params
            )
            for _ in range(num_homographies - 1)
        ]
        Hs = np.stack(Hs)
    else:
        Hs = np.asarray(homographies, np.float64)
    N = Hs.shape[0]

    imgs = np.stack([warp_perspective_f32(image, h) for h in Hs])
    masks = np.stack([_valid_mask(h, (H, W), erosion_radius) for h in Hs])

    if _forward is None:
        @jax.jit
        def _forward(v, im):
            out = model.apply(v, im, train=False)
            return cells_to_heatmap(out["semi"].astype(jnp.float32))

    # pipeline: dispatch chunk i+1's forward while fetching chunk i
    futs = [
        _forward(variables, jnp.asarray(imgs[c:c + chunk]))
        for c in range(0, N, chunk)
    ]
    acc = np.zeros((H, W), np.float64)
    macc = np.zeros((H, W), np.float64)
    for ci, fut in enumerate(futs):
        heat = np.asarray(fut)
        for j in range(heat.shape[0]):
            i = ci * chunk + j
            hinv = np.linalg.inv(Hs[i])
            acc += warp_perspective_f32(heat[j] * masks[i], hinv)
            macc += warp_perspective_f32(masks[i], hinv)  # bilinear, like the device path
    agg = (acc / np.maximum(macc, 1e-6)).astype(np.float32)

    pts, scores, valid = extract_keypoints(
        jnp.asarray(agg)[None], conf_thresh, nms_radius, top_k
    )
    return np.asarray(pts[0]), np.asarray(scores[0]), np.asarray(valid[0])


def export_pseudo_labels(
    model,
    variables: Mapping[str, Any],
    images,
    output_dir: str | Path,
    seed: int = 0,
    normalize_points: bool = False,
    **ha_kwargs,
) -> list[Path]:
    """Run adaptation over named images — a `{name: image}` mapping or a
    streaming `(name, image)` iterable — and save `{name}.npz` with
    `pts (K, 3) [x, y, prob]` (the reference export schema,
    `export_homography.py:171-177`).

    `host_warp=True` (default when the native library is available) warps
    on host CPU and keeps only the forwards on device — see
    `homography_adaptation_host`."""
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)

    host_warp = ha_kwargs.pop("host_warp", None)
    if host_warp is None:
        from yolopoint_tpu.data.native import available

        # On TPU the windowed-DMA Pallas warp (ops/pallas_warp.py) makes the
        # all-device program the fast path at every size (~0.5 s/image at
        # 640px for N=50 views); the host-warp path exists for CPU runs and
        # many-core hosts (measured 17 s/image at 640px on this 1-core host).
        host_warp = available() and jax.default_backend() != "tpu"

    if host_warp:
        np_rng = np.random.default_rng(seed)

        @jax.jit
        def fwd(v, im):
            out = model.apply(v, im, train=False)
            return cells_to_heatmap(out["semi"].astype(jnp.float32))

        def run_host(img):
            return homography_adaptation_host(
                model, variables, img, np_rng, _forward=fwd, **ha_kwargs
            )
    else:
        run = jax.jit(
            functools.partial(homography_adaptation_batch, model, variables, **ha_kwargs)
        )

    paths = []
    # accept a dict OR a streaming (name, image) iterable — materializing a
    # full f32 dataset dict costs ~10 GB host RAM at 2048x640x640x3
    items = images.items() if hasattr(images, "items") else images
    for i, (name, img) in enumerate(items):
        if host_warp:
            pts, scores, valid = run_host(np.asarray(img, np.float32))
        else:
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
