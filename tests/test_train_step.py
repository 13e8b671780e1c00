"""Train-step integration: sharded DP step on the 8-device CPU mesh,
augmentation pipeline, loader, photometric ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
# cold-compile >120 s on the 1-core CI host (file_times sweep, r4) -> slow tier
pytestmark = pytest.mark.slow


from yolopoint_tpu.data.augmentation import build_training_views, homographic_augment
from yolopoint_tpu.data.loader import DataLoader, pad_collate, length_normalized_weights
from yolopoint_tpu.data.photometric import photometric_augment, rgb_to_hsv, hsv_to_rgb
from yolopoint_tpu.losses.objects import ObjectLossConfig
from yolopoint_tpu.models import build_model
from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
from yolopoint_tpu.training.state import (
    create_train_state,
    freeze_mask_from_indices,
    make_optimizer,
    parse_str_slice,
    shrink_perturb,
)
from yolopoint_tpu.training.step import LossWeights, make_train_step, rescale_yolo_gains


def _tiny_batch(rng, B=8, H=64, W=64, n_pts=16, n_boxes=4, nc=3):
    return {
        "image": rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        "points": rng.uniform(0, min(H, W) - 4, (B, n_pts, 2)).astype(np.float32),
        "point_mask": np.ones((B, n_pts), bool),
        "boxes": np.concatenate(
            [
                rng.integers(0, nc, (B, n_boxes, 1)).astype(np.float32),
                rng.uniform(0.35, 0.65, (B, n_boxes, 2)).astype(np.float32),
                rng.uniform(0.15, 0.3, (B, n_boxes, 2)).astype(np.float32),
            ],
            axis=-1,
        ),
        "box_mask": np.ones((B, n_boxes), bool),
    }


AUG_CONFIG = {
    "photometric": {"enable": True, "params": {"random_brightness": {"max_abs_change": 40}}},
    "homographic": {
        "enable": True,
        "params": {"patch_ratio": 0.85},
        "valid_border_margin": 2,
    },
    "warped_pair": {},
}


def test_train_step_8dev_mesh_runs_and_updates(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    nc = 3
    model = build_model("YOLOPoint", "n", nc=nc)
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=1, steps_per_epoch=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx=tx)
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=nc, img_size=64)
    weights = LossWeights(num_samples_per_image=32, num_masked_non_matches_per_match=8)
    step = make_train_step(model, mesh, AUG_CONFIG, obj_cfg, weights, nc, donate=False)

    batch = shard_batch(_tiny_batch(rng), mesh)
    new_state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["loss_det"]) > 0
    assert float(aux["loss_obj"]) > 0
    # params updated
    diff = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                  state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # second step with the new state must also be finite (donation disabled)
    _, aux2 = step(new_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux2["loss"]))
    assert float(aux2["nonfinite_skip"]) == 0.0


def test_single_device_fast_path_matches_shard_map(rng):
    """On a 1-device mesh make_train_step compiles a PLAIN jitted step (the
    shard_map wrapper costs 8-40x inside lax.scan dispatches on v5e); the
    fast path must be bit-equivalent to the shard_map formulation on the
    same mesh — identical rng folding (replica index 0), losses, and
    updated params."""
    import jax.sharding as shd

    mesh1 = shd.Mesh(np.array(jax.devices()[:1]), ("data",))
    nc = 3
    model = build_model("YOLOPoint", "n", nc=nc)
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=1, steps_per_epoch=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx=tx)
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=nc, img_size=64)
    weights = LossWeights(num_samples_per_image=32, num_masked_non_matches_per_match=8)
    fast = make_train_step(model, mesh1, AUG_CONFIG, obj_cfg, weights, nc, donate=False)
    slow = make_train_step(model, mesh1, AUG_CONFIG, obj_cfg, weights, nc, donate=False,
                           force_shard_map=True)

    batch = _tiny_batch(rng, B=4)
    key = jax.random.PRNGKey(1)
    s_fast, aux_fast = fast(state, shard_batch(batch, mesh1), key)
    s_slow, aux_slow = slow(state, shard_batch(batch, mesh1), key)
    np.testing.assert_allclose(float(aux_fast["loss"]), float(aux_slow["loss"]), rtol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_fast.params, s_slow.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_train_step_skips_nonfinite_update(rng):
    """A batch that produces non-finite grads must leave the ENTIRE state
    (params, opt state, BN stats, step counter) untouched and report the
    skip — the GradScaler-skip analog guarding one-off pathological
    batches."""
    mesh = make_mesh()
    nc = 3
    model = build_model("YOLOPoint", "n", nc=nc)
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=1, steps_per_epoch=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx=tx)
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=nc, img_size=64)
    weights = LossWeights(num_samples_per_image=32, num_masked_non_matches_per_match=8)
    step = make_train_step(model, mesh, AUG_CONFIG, obj_cfg, weights, nc, donate=False)

    batch = _tiny_batch(rng)
    batch["image"][0] = np.nan  # poison one sample -> NaN loss/grads
    new_state, aux = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    assert float(aux["nonfinite_skip"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == int(state.step)
    # a clean batch afterwards trains normally
    clean = shard_batch(_tiny_batch(rng), mesh)
    st2, aux2 = step(new_state, clean, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux2["loss"]))
    assert float(aux2["nonfinite_skip"]) == 0.0
    assert int(st2.step) == int(state.step) + 1


def test_homographic_augment_shapes_and_masks(rng):
    B, H, W = 2, 64, 96
    batch = _tiny_batch(rng, B=B, H=H, W=W)
    out = homographic_augment(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["image"]), jnp.asarray(batch["points"]),
        jnp.asarray(batch["point_mask"]), jnp.asarray(batch["boxes"]),
        jnp.asarray(batch["box_mask"]), {"patch_ratio": 0.9}, valid_border_margin=2,
    )
    assert out.image.shape == (B, H, W, 3)
    assert out.labels_2d.shape == (B, H, W)
    assert out.valid_mask.shape == (B, H, W)
    m = np.asarray(out.valid_mask)
    assert 0.2 < m.mean() <= 1.0
    # label map pixels only where the point mask is valid
    assert np.asarray(out.labels_2d).sum() <= batch["points"].shape[1] * B
    # homography inverse consistency
    hh = np.asarray(out.homography) @ np.asarray(out.inv_homography)
    np.testing.assert_allclose(hh, np.broadcast_to(np.eye(3), (B, 3, 3)), atol=1e-4)


def test_build_training_views(rng):
    B = 2
    batch = _tiny_batch(rng, B=B)
    base, warped = build_training_views(
        jax.random.PRNGKey(3),
        jnp.asarray(batch["image"]), jnp.asarray(batch["points"]),
        jnp.asarray(batch["point_mask"]), jnp.asarray(batch["boxes"]),
        jnp.asarray(batch["box_mask"]), AUG_CONFIG,
    )
    assert base.image.shape == warped.image.shape
    assert bool(jnp.any(base.image != warped.image))
    assert np.asarray(warped.valid_mask).mean() > 0.1


def test_photometric_ops(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    params = {
        "random_brightness": {"max_abs_change": 50},
        "random_contrast": {"strength_range": [0.5, 1.5]},
        "additive_gaussian_noise": {"stddev_range": [0, 10]},
        "additive_speckle_noise": {"prob_range": [0, 0.0035]},
        "hsv": [0.1, 0.3, 0.3],
        "GaussianBlur": {"sigma": 1.0},
    }
    out = photometric_augment(jax.random.PRNGKey(0), imgs, params)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert bool(jnp.any(out != imgs))


def test_hsv_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_pad_collate_fixed_shapes(rng):
    samples = [
        {"image": rng.uniform(0, 1, (32, 32, 3)).astype(np.float32),
         "points": rng.uniform(0, 31, (n, 2)), "boxes": rng.uniform(0, 1, (m, 5)),
         "name": f"s{i}"}
        for i, (n, m) in enumerate([(5, 2), (9, 0), (0, 4)])
    ]
    batch = pad_collate(samples, max_points=16, max_boxes=8)
    assert batch["points"].shape == (3, 16, 2)
    assert batch["point_mask"].sum() == 14
    assert batch["box_mask"].sum() == 6


def test_weighted_sampling_balances_datasets():
    w = length_normalized_weights([10, 1000])
    assert abs(w[:10].sum() - 0.5) < 1e-6


def test_parse_str_slice():
    assert parse_str_slice("0-3, 7") == [0, 1, 2, 3, 7]


def test_freeze_mask_and_shrink_perturb(rng):
    params = {"a": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
              "b": {"kernel": jnp.ones((2, 2))}}
    mask = freeze_mask_from_indices(params, [0])
    flags = jax.tree_util.tree_leaves(mask)
    assert flags.count(False) == 1
    out = shrink_perturb(params, jax.random.PRNGKey(0), lam=0.5, sigma=0.0)
    np.testing.assert_allclose(np.asarray(out["a"]["kernel"]), 0.5)
    np.testing.assert_allclose(np.asarray(out["a"]["bias"]), 1.0)  # bias untouched
