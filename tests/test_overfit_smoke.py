"""Overfit smoke test: the training machinery must actually LEARN.

The reference's quality strategy includes a `--debug` overfitting run
(`/root/reference/src/train.py:628`, SURVEY.md §4.2). Here: plant bright
corner blobs at the labeled keypoints of a tiny fixed batch, run a few dozen
train steps, and require the joint loss to drop substantially and the
detector heatmap to concentrate on the planted points."""

import pytest
# cold-compile >120 s on the 1-core CI host (file_times sweep, r4) -> slow tier
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from yolopoint_tpu.losses.objects import ObjectLossConfig
from yolopoint_tpu.models import build_model
from yolopoint_tpu.ops.heatmap import cells_to_heatmap
from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
from yolopoint_tpu.training.state import create_train_state, make_optimizer
from yolopoint_tpu.training.step import LossWeights, make_train_step, rescale_yolo_gains


def test_detector_overfits_planted_corners(rng):
    B, H, W, nc = 8, 64, 64, 1
    n_pts = 6
    pts = np.stack([rng.uniform(8, W - 8, (B, n_pts)),
                    rng.uniform(8, H - 8, (B, n_pts))], -1).astype(np.float32)
    images = rng.uniform(0, 0.1, (B, H, W, 3)).astype(np.float32)
    for b in range(B):
        for x, y in np.floor(pts[b]).astype(int):
            images[b, y - 1:y + 2, x - 1:x + 2] = 1.0

    mesh = make_mesh()
    model = build_model("YOLOPoint", "n", nc=nc)
    tx = make_optimizer(learning_rate=3e-3, lrf=1.0)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3), tx=tx)
    # identity views: pure overfit signal, no augmentation noise
    aug = {"photometric": {"enable": False},
           "homographic": {"enable": False},
           "warped_pair": {"params": {"patch_ratio": 0.95, "perspective": False,
                                      "rotation": False, "scaling": False}}}
    obj = rescale_yolo_gains(ObjectLossConfig(), nc=nc, img_size=W)
    weights = LossWeights(num_samples_per_image=16,
                          num_masked_non_matches_per_match=4, lambda_obj=0.0)
    step = make_train_step(model, mesh, aug, obj, weights, nc, donate=False)
    batch = shard_batch({
        "image": images, "points": pts, "point_mask": np.ones((B, n_pts), bool),
        "boxes": np.zeros((B, 1, 5), np.float32),
        "box_mask": np.zeros((B, 1), bool),
    }, mesh)

    losses = []
    for i in range(70):
        state, aux = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(aux["loss_det"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], f"loss_det did not drop: {losses[0]:.3f} -> {losses[-1]:.3f}"

    # the detector heatmap should now put mass on the planted points
    out = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                      jnp.asarray(images), train=False)
    heat = np.asarray(cells_to_heatmap(out["semi"].astype(jnp.float32)))
    at_points = []
    for b in range(B):
        for x, y in np.floor(pts[b]).astype(int):
            at_points.append(heat[b, y, x])
    assert np.mean(at_points) > 2.5 * heat.mean(), (
        f"no concentration: planted {np.mean(at_points):.4f} vs mean {heat.mean():.4f}"
    )
