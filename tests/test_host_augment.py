"""Host-warp data path (`data.host_augment`): native warps must reproduce
the device augmentation views, and the precomputed train step must run."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
# cold-compile >120 s on the 1-core CI host (file_times sweep, r4) -> slow tier
pytestmark = pytest.mark.slow


from yolopoint_tpu.data.augmentation import build_training_views, homographic_augment
from yolopoint_tpu.data.host_augment import host_warp_views

AUG = {
    "photometric": {"enable": False},
    "homographic": {
        "enable": True,
        "params": {"perspective": True, "scaling": True, "rotation": True,
                    "translation": True, "patch_ratio": 0.85},
        "valid_border_margin": 3,
    },
    "warped_pair": {"params": {"perspective": True, "scaling": True,
                                "rotation": True, "translation": True,
                                "patch_ratio": 0.85}},
}


@pytest.fixture
def batch(rng=np.random.default_rng(0)):
    B, H, W = 2, 96, 128
    return {
        "image": rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        "points": rng.uniform(0, W - 1, (B, 24, 2)).astype(np.float32),
        "point_mask": np.ones((B, 24), bool),
        "boxes": np.concatenate([
            rng.integers(0, 3, (B, 6, 1)).astype(np.float32),
            rng.uniform(0.35, 0.65, (B, 6, 2)).astype(np.float32),
            rng.uniform(0.1, 0.25, (B, 6, 2)).astype(np.float32),
        ], axis=-1),
        "box_mask": np.ones((B, 6), bool),
    }


def test_host_views_match_device_warps(batch):
    """For the homographies the host sampled, warping on device must give
    the same base view (image within bilinear f32 rounding + u8
    quantization, identical masks and labels)."""
    out = host_warp_views(batch, AUG, np.random.default_rng(1))
    h1 = jnp.asarray(out["precomputed_h1"])
    images = jnp.asarray(batch["image"])
    dev = homographic_augment(
        None, images, jnp.asarray(batch["points"]),
        jnp.asarray(batch["point_mask"]), jnp.asarray(batch["boxes"]),
        jnp.asarray(batch["box_mask"]),
        valid_border_margin=3, homography=h1,
    )
    host_img = out["precomputed_image_base"].astype(np.float32) / 255.0
    assert np.abs(host_img - np.asarray(dev.image)).max() < 1.5 / 255.0
    assert np.array_equal(
        out["precomputed_valid_base"].astype(np.float32),
        np.asarray(dev.valid_mask),
    )


def test_precomputed_views_pipeline(batch):
    """build_training_views(precomputed=...) produces consistent views: the
    pair mask equals base mask warped by h2, labels derive from h1/h2."""
    out = host_warp_views(batch, AUG, np.random.default_rng(2))
    pre = {
        "image_base": jnp.asarray(out["precomputed_image_base"]),
        "valid_base": jnp.asarray(out["precomputed_valid_base"]),
        "image_pair": jnp.asarray(out["precomputed_image_pair"]),
        "valid_pair": jnp.asarray(out["precomputed_valid_pair"]),
        "h1": jnp.asarray(out["precomputed_h1"]),
        "h2": jnp.asarray(out["precomputed_h2"]),
    }
    base, warped = build_training_views(
        jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
        jnp.asarray(batch["points"]), jnp.asarray(batch["point_mask"]),
        jnp.asarray(batch["boxes"]), jnp.asarray(batch["box_mask"]),
        AUG, precomputed=pre,
    )
    assert base.image.shape == batch["image"].shape
    assert np.asarray(base.point_mask).any()
    # stored pair homography is h2, inverse consistent
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(warped.homography, warped.inv_homography)),
        np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5,
    )
    # base labels: points warped by inv(h1) in pixel coords land on the map
    lbl_sum = float(np.asarray(base.labels_2d).sum())
    assert lbl_sum > 0


def test_train_step_with_host_views(batch):
    """One full train step on the 8-device mesh with precomputed views."""
    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights, make_train_step, rescale_yolo_gains,
    )

    B, H, W = 8, 64, 64
    rng = np.random.default_rng(3)
    big = {
        "image": rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        "points": rng.uniform(0, W - 1, (B, 8, 2)).astype(np.float32),
        "point_mask": np.ones((B, 8), bool),
        "boxes": np.concatenate([
            np.zeros((B, 2, 1), np.float32),
            rng.uniform(0.4, 0.6, (B, 2, 2)).astype(np.float32),
            rng.uniform(0.2, 0.3, (B, 2, 2)).astype(np.float32),
        ], axis=-1),
        "box_mask": np.ones((B, 2), bool),
    }
    big = host_warp_views(big, AUG, np.random.default_rng(4))

    model = build_model("YOLOPoint", "n", nc=3)
    mesh = make_mesh(jax.devices()[:8])
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=2, steps_per_epoch=2)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3), tx=tx)
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=3, img_size=W)
    weights = LossWeights(num_samples_per_image=32, num_masked_non_matches_per_match=8)
    step = make_train_step(model, mesh, AUG, obj_cfg, weights, 3, donate=False)
    new_state, aux = step(state, shard_batch(big, mesh), jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))


def test_multi_step_matches_sequential(batch):
    """K scanned steps == K sequential step() calls (same rng folding)."""
    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights, make_multi_step, make_train_step, rescale_yolo_gains,
        stack_batches,
    )

    B, H, W = 4, 64, 64
    rng = np.random.default_rng(5)
    def mk(seed):
        r = np.random.default_rng(seed)
        return {
            "image": r.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
            "points": r.uniform(0, W - 1, (B, 8, 2)).astype(np.float32),
            "point_mask": np.ones((B, 8), bool),
            "boxes": np.concatenate([
                np.zeros((B, 2, 1), np.float32),
                r.uniform(0.4, 0.6, (B, 2, 2)).astype(np.float32),
                r.uniform(0.2, 0.3, (B, 2, 2)).astype(np.float32),
            ], axis=-1),
            "box_mask": np.ones((B, 2), bool),
        }
    b0, b1 = mk(10), mk(11)

    model = build_model("YOLOPointDet", "n", nc=1)
    mesh = make_mesh(jax.devices()[:4])
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=2, steps_per_epoch=2)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3), tx=tx)
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=1, img_size=W)
    weights = LossWeights(num_samples_per_image=16, num_masked_non_matches_per_match=4)
    aug = {"photometric": {"enable": False}, "homographic": {"enable": False},
           "warped_pair": {"params": {"translation": True, "patch_ratio": 0.9}}}
    step = make_train_step(model, mesh, aug, obj_cfg, weights, 1, donate=False)
    multi = make_multi_step(step, 2)

    key = jax.random.PRNGKey(7)
    s_seq = state
    s_seq, _ = step(s_seq, shard_batch(b0, mesh), jax.random.fold_in(key, 0))
    s_seq, _ = step(s_seq, shard_batch(b1, mesh), jax.random.fold_in(key, 1))

    stacked = shard_batch(stack_batches([b0, b1]), mesh, leading_stack=True)
    s_multi, aux = multi(state, stacked, key)
    assert aux["loss"].shape[0] == 2

    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
