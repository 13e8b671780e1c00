"""Crop-aware homography (`homography_big` chain) + mosaic device path.

Parity targets: `/root/reference/src/utils/homographies.py:129-143`
(crop conjugation), `/root/reference/src/datasets/DataClasses.py:611-729`
(mosaic composition + center crop + warp). The "done" bar from the round-1
verdict: a mosaic/crop sample's points and image stay warp-consistent to
sub-pixel accuracy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
# cold-compile >120 s on the 1-core CI host (file_times sweep, r4) -> slow tier
pytestmark = pytest.mark.slow


from yolopoint_tpu.data.augmentation import (
    build_training_views,
    crop_conjugate_homography,
    homographic_augment,
    mosaic_canvas_mask,
)
from yolopoint_tpu.evaluation.detector_eval import compute_repeatability
from yolopoint_tpu.ops.homography import sample_homography_batch


def test_crop_conjugate_identity():
    eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    crop_yx = jnp.asarray([[10, 20]] * 4, jnp.float32)
    out = crop_conjugate_homography(eye, crop_yx, (64, 96), (128, 256))
    np.testing.assert_allclose(np.asarray(out), np.asarray(eye), atol=1e-5)


def test_identity_crop_equals_host_crop(rng):
    """Identity homography in crop mode must reproduce a plain array crop."""
    B, Hf, Wf = 2, 96, 128
    hc, wc = 48, 64
    images = jnp.asarray(rng.uniform(0, 1, (B, Hf, Wf, 3)), jnp.float32)
    points = jnp.asarray(rng.uniform(0, 90, (B, 8, 2)), jnp.float32)
    crop_yx = jnp.asarray([[16, 32], [8, 0]], jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    view = homographic_augment(
        None, images, points, jnp.ones((B, 8), bool),
        jnp.zeros((B, 2, 5)), jnp.zeros((B, 2), bool),
        homography=eye, crop_yx=crop_yx, crop_hw=(hc, wc),
    )
    assert view.image.shape == (B, hc, wc, 3)
    for b, (y, x) in enumerate([(16, 32), (8, 0)]):
        np.testing.assert_allclose(
            np.asarray(view.image[b]), np.asarray(images[b, y:y + hc, x:x + wc]),
            atol=1e-5,
        )
        expect = np.floor(np.asarray(points[b])) - np.array([x, y])
        np.testing.assert_allclose(np.asarray(view.points[b]), expect, atol=1e-4)


def test_crop_warp_image_point_consistency(rng):
    """Plant bright blobs in the FULL frame; after the crop-frame warp the
    blobs must appear at the warped point locations (<= 1px, bilinear)."""
    B, Hf, Wf = 2, 128, 160
    hc, wc = 64, 96
    n = 6
    pts = np.stack([
        rng.uniform(30, Wf - 30, (B, n)), rng.uniform(30, Hf - 30, (B, n))
    ], axis=-1).astype(np.float32)
    images = np.zeros((B, Hf, Wf, 1), np.float32)
    for b in range(B):
        for x, y in np.floor(pts[b]).astype(int):
            images[b, y, x, 0] = 1.0

    crop_yx = jnp.asarray([[32, 32], [16, 48]], jnp.float32)
    hom = sample_homography_batch(
        jax.random.PRNGKey(3), B,
        perspective_amplitude_x=0.05, perspective_amplitude_y=0.05,
        scaling_amplitude=0.1, max_angle=0.2, patch_ratio=0.9,
    )
    view = homographic_augment(
        None, jnp.asarray(images), jnp.asarray(pts), jnp.ones((B, n), bool),
        jnp.zeros((B, 1, 5)), jnp.zeros((B, 1), bool),
        homography=hom, crop_yx=crop_yx, crop_hw=(hc, wc),
    )
    img = np.asarray(view.image)[..., 0]
    wpts = np.asarray(view.points)
    ok = np.asarray(view.point_mask)
    checked = 0
    for b in range(B):
        for (x, y), v in zip(wpts[b], ok[b]):
            if not v or not (3 <= x < wc - 3 and 3 <= y < hc - 3):
                continue
            window = img[b, int(y) - 2:int(y) + 3, int(x) - 2:int(x) + 3]
            if window.max() < 0.05:  # blob warped partly outside sample grid
                continue
            dy, dx = np.unravel_index(window.argmax(), window.shape)
            err = np.hypot(dy - 2 + int(y) - y, dx - 2 + int(x) - x)
            assert err <= 1.0, f"blob/point drift {err:.2f}px"
            checked += 1
    assert checked >= n  # enough blobs actually verified


def _mosaic_batch(rng, B=2, th=48, tw=64, n_pts=30):
    Hf, Wf = 2 * th, 2 * tw
    images = rng.uniform(0, 1, (B, Hf, Wf, 3)).astype(np.float32)
    points = np.stack([
        rng.uniform(5, Wf - 5, (B, n_pts)), rng.uniform(5, Hf - 5, (B, n_pts))
    ], axis=-1).astype(np.float32)
    boxes = np.concatenate([
        rng.integers(0, 3, (B, 4, 1)).astype(np.float32),
        rng.uniform(0.3, 0.7, (B, 4, 2)).astype(np.float32),
        rng.uniform(0.1, 0.2, (B, 4, 2)).astype(np.float32),
    ], axis=-1)
    return {
        "image": images, "points": points,
        "point_mask": np.ones((B, n_pts), bool),
        "boxes": boxes, "box_mask": np.ones((B, 4), bool),
        "mosaic_crop_yx": np.tile(np.array([[th // 2, tw // 2]], np.float32), (B, 1)),
    }


MOSAIC_CFG = {
    "photometric": {"enable": False},
    "homographic": {
        "enable": True,
        "params": {"patch_ratio": 0.9, "scaling_amplitude": 0.1, "max_angle": 0.2},
        "mosaic": {"params": {"patch_ratio": 0.85, "scaling_amplitude": 0.15,
                              "max_angle": 0.4}},
        "valid_border_margin": 2,
    },
    "warped_pair": {},
}


def test_mosaic_views_shapes_and_chain(rng):
    """Mosaic canvas (2H, 2W) -> both views are the center (H, W) crop and
    base<->warped stay linked by the stored pair homography (rep ~ 1)."""
    th, tw = 48, 64
    batch = _mosaic_batch(rng, th=th, tw=tw)
    base, warped = build_training_views(
        jax.random.PRNGKey(11),
        jnp.asarray(batch["image"]), jnp.asarray(batch["points"]),
        jnp.asarray(batch["point_mask"]), jnp.asarray(batch["boxes"]),
        jnp.asarray(batch["box_mask"]), MOSAIC_CFG,
        crop_yx=jnp.asarray(batch["mosaic_crop_yx"]), mosaic=True,
    )
    B = batch["image"].shape[0]
    assert base.image.shape == (B, th, tw, 3)
    assert warped.image.shape == (B, th, tw, 3)
    assert base.valid_mask.shape == (B, th, tw)
    assert 0.1 < np.asarray(base.valid_mask).mean() <= 1.0

    hom = np.asarray(warped.homography)
    inv_h = np.asarray(warped.inv_homography)
    for b in range(B):
        bp = np.asarray(base.points[b])[np.asarray(base.point_mask[b])]
        wp = np.asarray(warped.points[b])[np.asarray(warped.point_mask[b])]
        if len(bp) < 4 or len(wp) < 4:
            continue
        kp = np.concatenate([bp, np.ones((len(bp), 1))], 1)
        wkp = np.concatenate([wp, np.ones((len(wp), 1))], 1)
        rep, loc = compute_repeatability(kp, wkp, hom[b], inv_h[b], (th, tw))
        assert rep > 0.85, f"mosaic H chain broken: rep={rep}"
        assert 0 <= loc < 0.5, f"mosaic point drift {loc}px"


def test_mosaic_canvas_mask():
    m = np.asarray(mosaic_canvas_mask((64, 96)))
    assert m.shape == (64, 96)
    assert m[0].sum() == 0 and m[:, 0].sum() == 0        # outer border
    assert m[32].sum() == 0 and m[:, 48].sum() == 0      # tile seams
    assert m[16, 24] == 1.0


def test_dataset_device_crop_and_loader(tmp_path, rng):
    """End-to-end host path: synthetic KITTI-style dataset -> device-crop
    samples carry crop_yx; mosaic batches carry mosaic_crop_yx at 2x shape."""
    import cv2

    from yolopoint_tpu.data.datasets import build_dataset
    from yolopoint_tpu.data.loader import DataLoader

    root = tmp_path / "datasets"
    img_dir = root / "kitti" / "images" / "train"
    lbl_dir = root / "kitti" / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(4):
        img = (rng.uniform(0, 255, (74, 244, 3))).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:03d}.png"), img)
        (lbl_dir / f"{i:03d}.txt").write_text("1 0.5 0.5 0.2 0.3\n")

    config = {
        "dataset": "kitti",
        "suffix": ".png",
        "preprocessing": {"img_size": 192},
        "augmentation": {
            "mosaic": 1.0,
            "homographic": {"enable": True, "cropHW": [32, 96], "device_crop": True},
        },
    }
    ds = build_dataset(config, action="train", names=["a", "b"], root=root)

    plain = ds.get(0, mosaic=False)
    assert "crop_yx" in plain
    Hb, Wb = plain["image"].shape[:2]
    assert Hb % 32 == 0 and Wb % 32 == 0 and Hb >= 32 and Wb >= 96

    mos = ds.get(0, mosaic=True)
    assert "mosaic_crop_yx" in mos
    assert mos["image"].shape[:2] == (64, 192)  # 2x cropHW
    np.testing.assert_array_equal(mos["mosaic_crop_yx"], [16, 48])

    loader = DataLoader([ds], batch_size=2, max_points=8, max_boxes=8, seed=0)
    batch = next(iter(loader))
    key = "mosaic_crop_yx" if "mosaic_crop_yx" in batch else "crop_yx"
    assert batch[key].shape == (2, 2)
    assert batch["image"].ndim == 4


def test_train_step_with_device_crop_batch(rng):
    """The jitted DP train step consumes full-frame batches + crop corners
    (the KITTI cropHW workflow) and produces finite losses/updates."""
    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights, make_train_step, rescale_yolo_gains,
    )

    mesh = make_mesh()
    nc = 2
    Hf, Wf, hc, wc = 96, 160, 64, 96
    model = build_model("YOLOPoint", "n", nc=nc)
    tx = make_optimizer(learning_rate=1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, hc, wc, 3), tx=tx)
    aug = {
        "photometric": {"enable": False},
        "homographic": {"enable": True, "cropHW": [hc, wc],
                        "params": {"patch_ratio": 0.9}, "valid_border_margin": 2},
        "warped_pair": {},
    }
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=nc, img_size=wc)
    weights = LossWeights(num_samples_per_image=16, num_masked_non_matches_per_match=4)
    step = make_train_step(model, mesh, aug, obj_cfg, weights, nc, donate=False)

    B = 8
    batch = shard_batch({
        "image": rng.uniform(0, 1, (B, Hf, Wf, 3)).astype(np.float32),
        "points": rng.uniform(5, 90, (B, 10, 2)).astype(np.float32),
        "point_mask": np.ones((B, 10), bool),
        "boxes": np.concatenate(
            [rng.integers(0, nc, (B, 3, 1)).astype(np.float32),
             rng.uniform(0.4, 0.6, (B, 3, 2)).astype(np.float32),
             rng.uniform(0.1, 0.2, (B, 3, 2)).astype(np.float32)], axis=-1),
        "box_mask": np.ones((B, 3), bool),
        "crop_yx": np.stack([rng.integers(0, Hf - hc, B),
                             rng.integers(0, Wf - wc, B)], -1).astype(np.float32),
    }, mesh)
    new_state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"])) and float(aux["loss"]) > 0
    delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)))
    assert delta > 0
