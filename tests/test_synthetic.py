"""Synthetic-shapes generator tests: determinism, label correctness (points
on actual rendered corners), loader integration, and a train-step smoke.

The generator is this repo's from-scratch MagicPoint-stage data source (the
reference ships none and trains from pre-exported pseudo-labels,
`/root/reference/src/train.py:176-307`)."""

import numpy as np
import pytest
# cold-compile >120 s on the 1-core CI host (file_times sweep, r4) -> slow tier
pytestmark = pytest.mark.slow


from yolopoint_tpu.data.synthetic import (
    SHAPE_CLASS_NAMES,
    SyntheticShapes,
    render_sample,
)

CFG = {
    "dataset": "synthetic_shapes",
    "preprocessing": {"resize": [128, 160]},
    "length": {"train": 64, "val": 16},
    "generation": {"seed": 3},
}
NAMES = list(SHAPE_CLASS_NAMES)


def _ds(action="train", names=NAMES, cfg=None):
    return SyntheticShapes(cfg or CFG, action, names=names)


def test_shapes_and_ranges():
    ds = _ds()
    for i in range(20):
        s = ds.get(i)
        assert s["image"].shape == (128, 160, 3)
        assert s["image"].dtype == np.uint8  # u8 payload, normalized on device
        if len(s["points"]):
            assert s["points"][:, 0].max() <= 159 and s["points"][:, 1].max() <= 127
            assert s["points"].min() >= 0
        if len(s["boxes"]):
            assert s["boxes"][:, 0].max() < len(NAMES)
            assert s["boxes"][:, 1:].min() >= -1e-6
            assert s["boxes"][:, 1:].max() <= 1.0 + 1e-6


def test_deterministic_per_index_and_split():
    ds = _ds()
    a, b = ds.get(7), ds.get(7)
    assert np.array_equal(a["image"], b["image"])
    assert np.array_equal(a["points"], b["points"])
    assert np.array_equal(a["boxes"], b["boxes"])
    # different index / split -> different image
    assert not np.array_equal(ds.get(7)["image"], ds.get(8)["image"])
    dv = _ds("val")
    assert not np.array_equal(ds.get(7)["image"], dv.get(7)["image"])
    assert len(dv) == 16


def test_points_lie_on_corners():
    """Labeled keypoints must coincide with actual image corners: Harris
    response at labels far above response at random locations."""
    import cv2

    ds = _ds()
    rng = np.random.default_rng(0)
    lab, rand = [], []
    for i in range(40):
        s = ds.get(i)
        pts = s["points"]
        if not len(pts):
            continue
        g = np.float32(s["image"][..., 0]) / 255.0  # Harris threshold below assumes [0,1]
        R = cv2.dilate(cv2.cornerHarris(g, 4, 5, 0.04), np.ones((5, 5)))
        xi = np.clip(pts[:, 0].round().astype(int), 0, 159)
        yi = np.clip(pts[:, 1].round().astype(int), 0, 127)
        lab += list(R[yi, xi])
        rand += list(R[rng.integers(0, 128, len(pts)), rng.integers(0, 160, len(pts))])
    lab, rand = np.array(lab), np.array(rand)
    assert (lab > 1e-4).mean() > 0.8
    assert (rand > 1e-4).mean() < 0.2


def test_render_cache_hit_and_isolation():
    """Second epoch must not re-render (cache hit) and cached label arrays
    must be isolated from caller mutation."""
    ds = _ds()
    a = ds.get(5)
    assert 5 in ds._cache
    import unittest.mock as mock

    with mock.patch("yolopoint_tpu.data.synthetic.render_sample",
                    side_effect=AssertionError("re-rendered cached idx")):
        b = ds.get(5)
    assert np.array_equal(a["image"], b["image"])
    if len(b["points"]):
        b["points"][:] = -1.0  # mutate the returned copy...
        assert not np.array_equal(ds.get(5)["points"], b["points"])  # ...cache intact

    ds_nc = _ds(cfg=dict(CFG, generation={"seed": 3, "cache": False}))
    ds_nc.get(5)
    assert not ds_nc._cache


def test_class_name_mapping_drops_unknown():
    # run restricted to two classes: other boxes are dropped, ids remapped
    ds = _ds(names=["star", "polygon"])
    seen = set()
    for i in range(64):
        b = ds.get(i)["boxes"]
        if len(b):
            seen.update(b[:, 0].astype(int).tolist())
    assert seen <= {0, 1}


def test_primitive_filter():
    from yolopoint_tpu.data.synthetic import _rng_for

    for i in range(8):
        img, pts, boxes = render_sample(_rng_for(0, "train", i), 64, 64,
                                        primitives=["ellipses"])
        assert len(pts) == 0 and len(boxes) > 0
        assert np.all(boxes[:, 0] == 2)  # ellipse class id


def test_loader_integration_and_sample_batch():
    from yolopoint_tpu.data.loader import DataLoader

    ds = _ds()
    loader = DataLoader([ds], batch_size=4, shuffle=True, seed=0)
    probe = loader.sample_batch()
    assert probe["image"].shape == (1, 128, 160, 3)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 128, 160, 3)
    assert batch["points"].shape[0] == 4 and batch["point_mask"].dtype == bool
    # registry dispatch
    from yolopoint_tpu.data.datasets import build_dataset

    ds2 = build_dataset(CFG, "train", NAMES)
    assert isinstance(ds2, SyntheticShapes)


@pytest.mark.slow
def test_synthetic_train_step_decreases_loss():
    """Joint train step on synthetic data: loss drops over a few steps on the
    8-device CPU mesh (end-to-end wiring check, not convergence)."""
    import jax

    from yolopoint_tpu.data.loader import DataLoader
    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import LossWeights, make_train_step

    ds = _ds()
    loader = DataLoader([ds], batch_size=8, shuffle=True, seed=0)
    model = build_model("YOLOPoint", "n", nc=len(NAMES))
    mesh = make_mesh()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 128, 160, 3),
        tx=make_optimizer(learning_rate=1e-3, steps_per_epoch=10),
    )
    aug = {"homographic": {"enable": True, "params": {"perspective": True},
                           "valid_border_margin": 2},
           "warped_pair": {"params": {"perspective": True}}}
    step = make_train_step(model, mesh, aug, ObjectLossConfig(),
                           LossWeights(num_samples_per_image=128,
                                       num_masked_non_matches_per_match=16),
                           len(NAMES))
    losses = []
    it = iter(loader)
    batch = next(it)
    batch.pop("names")
    sb = shard_batch(batch, mesh)
    for i in range(8):
        state, aux = step(state, sb, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


def test_materialize_roundtrip(tmp_path):
    """tools/make_synthetic_dataset.py writes the on-disk layout that
    ImagePointBoxDataset reads back (images/labels/points dirs)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from tools.make_synthetic_dataset import materialize

    from yolopoint_tpu.data.datasets import ImagePointBoxDataset

    materialize(tmp_path / "synds", "train", 3, (128, 160), seed=3)
    ds = ImagePointBoxDataset(
        {"dataset": "synds", "preprocessing": {"img_size": 160},
         "labels": {"points": str(tmp_path / "synds" / "points")}},
        "train", names=NAMES, root=str(tmp_path))
    assert len(ds) == 3
    s = ds.get(0)
    src = _ds(cfg=dict(CFG, preprocessing={"resize": [128, 160]},
                       length={"train": 3})).get(0)
    # same source sample modulo the loader's square letterbox
    assert s["image"].shape == (160, 160, 3)
    assert len(s["points"]) == len(src["points"])
    assert len(s["boxes"]) == len(src["boxes"])


def test_points_dir_pseudo_labels(tmp_path):
    """Stage-3 bootstrap: generation.points_dir swaps the exact rendered
    corners for exported {name}.npz pseudo-labels on the TRAIN split only
    (the reference's datasets load keypoint labels from .npz the same way,
    `/root/reference/src/datasets/DataClasses.py:92-112`)."""
    fake = np.array([[10.0, 20.0, 0.9], [33.0, 44.0, 0.5]], np.float32)
    np.savez_compressed(tmp_path / "synth_train_000002.npz", pts=fake)
    cfg = dict(CFG, generation={"seed": 3, "points_dir": str(tmp_path)})

    s = _ds("train", cfg=cfg).get(2)
    np.testing.assert_allclose(s["points"], fake[:, :2])

    # val split keeps exact labels (metrics measured against ground truth)
    sv = _ds("val", cfg=cfg).get(2)
    exact = _ds("val").get(2)["points"]
    np.testing.assert_allclose(sv["points"], exact)
