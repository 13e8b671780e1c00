"""Device-resident dataset tests: the jitted on-device index-gather must
yield exactly the batches the host loader would (same epoch schedule, same
payloads), sharded along the data axis of the mesh."""

import numpy as np
import pytest
# cold-compile >120 s on the 1-core CI host (file_times sweep, r4) -> slow tier
pytestmark = pytest.mark.slow


from yolopoint_tpu.data.loader import DataLoader
from yolopoint_tpu.data.synthetic import SHAPE_CLASS_NAMES, SyntheticShapes

CFG = {
    "dataset": "synthetic_shapes",
    "preprocessing": {"resize": [64, 64]},
    "length": {"train": 32, "val": 8},
    "generation": {"seed": 5},
}


def _base(seed=1):
    ds = SyntheticShapes(CFG, "train", names=list(SHAPE_CLASS_NAMES))
    return DataLoader([ds], batch_size=8, shuffle=True, seed=seed,
                      max_points=64, max_boxes=16)


def test_matches_host_loader_batches():
    from yolopoint_tpu.data.device_data import DeviceDataLoader
    from yolopoint_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    dev = DeviceDataLoader(_base(), mesh)
    host = _base()
    for bh, bd in zip(host, dev):
        bh.pop("names")
        assert set(bd) == set(bh)
        assert np.asarray(bd["image"]).dtype == bh["image"].dtype
        for k in bh:
            np.testing.assert_array_equal(np.asarray(bd[k]), bh[k], err_msg=k)
        # data-parallel layout: batch dim sharded over the mesh
        spec = bd["image"].sharding.spec
        assert spec and spec[0] is not None


def test_epoch_schedules_advance():
    from yolopoint_tpu.data.device_data import DeviceDataLoader
    from yolopoint_tpu.parallel.mesh import make_mesh

    dev = DeviceDataLoader(_base(), make_mesh())
    e1 = [np.asarray(b["image"]) for b in dev]
    e2 = [np.asarray(b["image"]) for b in dev]
    assert len(e1) == len(dev) == 4
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))


def test_rejects_host_warp_and_mosaic():
    from yolopoint_tpu.data.device_data import DeviceDataLoader
    from yolopoint_tpu.parallel.mesh import make_mesh

    base = _base()
    base.host_augment_config = {"homographic": {}}
    with pytest.raises(ValueError):
        DeviceDataLoader(base, make_mesh())


def test_host_array_disk_cache(tmp_path):
    """Second build with the same generator config loads from the .npy
    cache (no re-render); different config misses."""
    import unittest.mock as mock

    from yolopoint_tpu.data import device_data
    from yolopoint_tpu.data.device_data import build_host_arrays

    ds = SyntheticShapes(CFG, "train", names=list(SHAPE_CLASS_NAMES))
    a = build_host_arrays([ds], 64, 16, cache_dir=str(tmp_path))
    with mock.patch.object(type(ds), "get",
                           side_effect=AssertionError("cache missed")):
        b = build_host_arrays([ds], 64, 16, cache_dir=str(tmp_path))
    for k in device_data.ARRAY_KEYS:
        np.testing.assert_array_equal(a[k], np.asarray(b[k]), err_msg=k)
    ds2 = SyntheticShapes(dict(CFG, generation={"seed": 6}), "train",
                          names=list(SHAPE_CLASS_NAMES))
    c = build_host_arrays([ds2], 64, 16, cache_dir=str(tmp_path))
    assert not np.array_equal(c["image"], a["image"])


def test_train_step_on_device_batches():
    """End-to-end: a jitted train step consumes gathered device batches
    (u8 image normalized inside the step) and produces a finite loss."""
    import jax

    from yolopoint_tpu.data.device_data import DeviceDataLoader
    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import LossWeights, make_train_step

    mesh = make_mesh()
    dev = DeviceDataLoader(_base(), mesh)
    model = build_model("YOLOPoint", "n", nc=len(SHAPE_CLASS_NAMES))
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3),
        tx=make_optimizer(learning_rate=1e-3, steps_per_epoch=4),
    )
    aug = {"homographic": {"enable": True, "params": {"perspective": True},
                           "valid_border_margin": 2},
           "warped_pair": {"params": {"perspective": True}}}
    step = make_train_step(
        model, mesh, aug, ObjectLossConfig(),
        LossWeights(num_samples_per_image=32,
                    num_masked_non_matches_per_match=8),
        len(SHAPE_CLASS_NAMES), donate=False,
    )
    batch = next(iter(dev))
    _, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))


def test_device_scan_matches_host_stacked_scan():
    """make_device_multi_step (gather inside the scan) must produce the SAME
    state/aux as make_multi_step over the pre-gathered stacked batches —
    both fold the dispatch rng by step index."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.data.device_data import DeviceDataLoader
    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights,
        make_device_multi_step,
        make_multi_step,
        make_train_step,
        rescale_yolo_gains,
        stack_batches,
    )

    mesh = make_mesh()
    nc = len(SHAPE_CLASS_NAMES)
    model = build_model("YOLOPoint", "n", nc=nc)
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=1, steps_per_epoch=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx=tx)
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=nc, img_size=64)
    weights = LossWeights(num_samples_per_image=16, num_masked_non_matches_per_match=4)
    aug = {"photometric": {"enable": False},
           "homographic": {"enable": True, "params": {"patch_ratio": 0.85},
                           "valid_border_margin": 2},
           "warped_pair": {}}
    step = make_train_step(model, mesh, aug, obj_cfg, weights, nc, donate=False)

    K = 2
    dev = DeviceDataLoader(_base(), mesh)
    rows = dev.epoch_rows()[:K]
    rng = jax.random.PRNGKey(7)

    host_multi = make_multi_step(step, K)
    batches = [dev.gather_row(r) for r in rows]
    stacked = shard_batch(stack_batches(
        [{k: np.asarray(v) for k, v in b.items()} for b in batches]
    ), mesh, leading_stack=True)
    s_host, aux_host = host_multi(state, stacked, rng)

    # device-scan path donates its state argument -> run it LAST
    step0 = int(state.step)
    dev_multi = make_device_multi_step(step, K)
    s_dev, aux_dev = dev_multi(state, dev.resident_data, jnp.asarray(rows), rng)

    np.testing.assert_allclose(
        np.asarray(aux_dev["loss"]), np.asarray(aux_host["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(s_dev.params)
    b = jax.tree_util.tree_leaves(s_host.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    assert int(s_dev.step) == step0 + K
