"""Loss parity vs the reference torch implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests.reference_oracle import REFERENCE_SRC, install_torchvision_stub
from yolopoint_tpu.losses.detector import detector_loss
from yolopoint_tpu.losses.objects import ObjectLossConfig, object_loss
from yolopoint_tpu.losses.descriptor import descriptor_loss_dense, descriptor_loss_sparse
from yolopoint_tpu.ops.heatmap import cell_valid_mask, labels_to_cells


@pytest.fixture(scope="module")
def ref_loss_mod():
    install_torchvision_stub()
    import sys

    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    import importlib

    return importlib.import_module("utils.loss_functions")


def test_detector_loss_matches_reference(rng, ref_loss_mod):
    B, Hc, Wc = 2, 8, 10
    H, W = Hc * 8, Wc * 8
    semi = rng.normal(0, 1, (B, Hc, Wc, 65)).astype(np.float32)
    labels2d = (rng.uniform(0, 1, (B, H, W)) > 0.98).astype(np.float32)
    mask2d = np.ones((B, H, W), np.float32)
    mask2d[:, :16] = 0.0

    target = labels_to_cells(jnp.asarray(labels2d))
    cmask = cell_valid_mask(jnp.asarray(mask2d))
    ours = float(detector_loss(jnp.asarray(semi), target, cmask))

    # torch oracle
    import sys

    sys.path.insert(0, str(REFERENCE_SRC))
    from utils.utils import getMasks, labels2Dto3D

    semi_t = torch.tensor(semi.transpose(0, 3, 1, 2))
    labels_3d = labels2Dto3D(torch.tensor(labels2d)[:, None])
    mask_flat = getMasks(torch.tensor(mask2d)[:, None], "cpu")
    crit = ref_loss_mod.ComputeDetectorLoss("cpu")
    ref = float(crit(semi_t, labels_3d.float(), mask_flat))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_detector_loss_finite_at_softmax_saturation(rng):
    """Confident logits drive softmax to p == 1.0 (and on TPU's approximate
    f32 divide, 1 + 1ulp). Loss AND grads must stay finite — the exact
    failure that NaN'd a real training run at epoch 2."""
    B, Hc, Wc = 1, 4, 4
    semi = np.full((B, Hc, Wc, 65), -60.0, np.float32)
    semi[..., 7] = 60.0  # p[7] == 1.0 exactly in f32, rest flushed to 0
    labels2d = np.zeros((B, Hc * 8, Wc * 8), np.float32)
    labels2d[:, 0, 0] = 1.0  # target says corner channel 0 -> model is
    # confidently WRONG in cell (0,0): the log(1-p) term is at its worst
    target = labels_to_cells(jnp.asarray(labels2d))
    cmask = cell_valid_mask(jnp.ones((B, Hc * 8, Wc * 8), np.float32))

    val, grads = jax.value_and_grad(
        lambda s: detector_loss(s, target, cmask))(jnp.asarray(semi))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grads)))
    # and a p-slightly-above-1 input (what the TPU divide produces) must not
    # leak a NaN through the log either: emulate by bypassing softmax range
    p_bad = jnp.float32(1.0 + 1e-7)
    assert np.isfinite(float(jnp.log(jnp.clip(p_bad, 0.0, 1.0) * 0 + (1.0 - jnp.clip(p_bad, 0.0, 1.0) + 1e-7))))


def test_detector_loss_ce_matches_manual_and_stays_finite(rng):
    """CE option (from-scratch MagicPoint objective): matches the manual
    -sum(t·log_softmax) masked mean, and keeps bounded grads at the exact
    saturated-logit input that maxes out the BCE variant."""
    from yolopoint_tpu.losses.detector import detector_loss_ce

    B, Hc, Wc = 2, 6, 8
    semi = rng.normal(0, 3, (B, Hc, Wc, 65)).astype(np.float32)
    labels2d = (rng.uniform(0, 1, (B, Hc * 8, Wc * 8)) > 0.97).astype(np.float32)
    mask2d = np.ones((B, Hc * 8, Wc * 8), np.float32)
    mask2d[:, -24:] = 0.0
    target = np.asarray(labels_to_cells(jnp.asarray(labels2d)))
    cmask = np.asarray(cell_valid_mask(jnp.asarray(mask2d)))

    ours = float(detector_loss_ce(jnp.asarray(semi), jnp.asarray(target), jnp.asarray(cmask)))
    x = semi - semi.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    manual = ((-(target * logp).sum(-1) * cmask).sum() / cmask.sum())
    np.testing.assert_allclose(ours, manual, rtol=1e-5)

    # saturated confidently-wrong cell: grad must be bounded by p - t (<= 1)
    semi_sat = np.full((1, 4, 4, 65), -60.0, np.float32)
    semi_sat[..., 7] = 60.0
    l2d = np.zeros((1, 32, 32), np.float32)
    l2d[:, 0, 0] = 1.0
    t = labels_to_cells(jnp.asarray(l2d))
    m = cell_valid_mask(jnp.ones((1, 32, 32), np.float32))
    val, grads = jax.value_and_grad(
        lambda s: detector_loss_ce(s, t, m))(jnp.asarray(semi_sat))
    g = np.asarray(grads)
    assert np.isfinite(float(val)) and np.all(np.isfinite(g))
    assert np.abs(g).max() <= 1.0  # (p - t) / n_valid_cells, per element


class _FakeDetect:
    pass


class _FakeInner:
    pass


class _FakeModel:
    """Minimal stand-in exposing .model.Detect for ComputeObjectLoss."""

    def __init__(self, anchors_ps, nc, nl=3, na=3):
        d = _FakeDetect()
        d.anchors = torch.tensor(anchors_ps, dtype=torch.float32)
        d.stride = torch.tensor([8.0, 16.0, 32.0])
        d.na, d.nc, d.nl = na, nc, nl
        inner = _FakeInner()
        inner.Detect = d
        self.model = inner


@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_object_loss_matches_reference(rng, ref_loss_mod):
    from yolopoint_tpu.models.detect import Detect

    nc, B, M = 5, 2, 12
    det = Detect(nc=nc)
    anchors_ps = det.anchors_per_stride()

    shapes = [(B, 3, 16, 20, nc + 5), (B, 3, 8, 10, nc + 5), (B, 3, 4, 5, nc + 5)]
    preds = [rng.normal(0, 1, s).astype(np.float32) for s in shapes]

    # random normalized targets, some rows padded
    tmask = np.zeros((B, M), bool)
    tmask[0, :5] = True
    tmask[1, :8] = True
    targets = np.zeros((B, M, 5), np.float32)
    targets[..., 0] = rng.integers(0, nc, (B, M))
    targets[..., 1:3] = rng.uniform(0.1, 0.9, (B, M, 2))
    targets[..., 3:5] = rng.uniform(0.05, 0.4, (B, M, 2))
    targets[~tmask] = 0.0

    cfg = ObjectLossConfig(box=0.05, obj=1.0, cls=0.5, anchor_t=4.0)
    total, parts = object_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(targets), jnp.asarray(tmask),
        anchors_ps, cfg, nc,
    )

    # reference oracle
    config = dict(cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0, anchor_t=4.0,
                  box=0.05, obj=1.0, cls=0.5, label_smoothing=0.0)
    crit = ref_loss_mod.ComputeObjectLoss(_FakeModel(anchors_ps, nc), config, "cpu")
    rows = []
    for b in range(B):
        for m in range(M):
            if tmask[b, m]:
                rows.append([b, *targets[b, m]])
    t_ref = torch.tensor(np.asarray(rows, np.float32))
    p_ref = [torch.tensor(p) for p in preds]
    total_ref, items_ref = crit(p_ref, t_ref)

    np.testing.assert_allclose(float(parts["box"]), float(items_ref[0]), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(parts["obj"]), float(items_ref[1]), rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(float(parts["cls"]), float(items_ref[2]), rtol=2e-3, atol=1e-5)


def test_dense_descriptor_loss_matches_reference(rng, ref_loss_mod):
    B, Hc, Wc, D = 2, 6, 8, 16
    desc = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    descw = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    descw /= np.linalg.norm(descw, axis=-1, keepdims=True)
    Hs = np.stack([np.eye(3) + rng.normal(0, 0.03, (3, 3)) * 0.5 for _ in range(B)]).astype(
        np.float32
    )
    Hs[:, 2, :2] = 0  # affine only, keeps oracle comparison clean

    # full-res valid mask; the reference signature takes the CELL-level mask
    # (its mask_valid=None default path is broken upstream:
    # loss_functions.py:324-328 view/broadcast mismatch)
    mask2d = np.ones((B, Hc * 8, Wc * 8), np.float32)
    mask2d[:, : 2 * 8] = 0.0
    cell_mask = np.asarray(cell_valid_mask(jnp.asarray(mask2d)))  # (B, Hc, Wc)

    ours = float(
        descriptor_loss_dense(
            jnp.asarray(desc), jnp.asarray(descw), jnp.asarray(Hs), jnp.asarray(mask2d)
        )
    )
    ref = float(
        ref_loss_mod.descriptor_loss_dense(
            torch.tensor(desc.transpose(0, 3, 1, 2)),
            torch.tensor(descw.transpose(0, 3, 1, 2)),
            torch.tensor(Hs),
            mask_valid=torch.tensor(cell_mask[:, None]),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_sparse_descriptor_loss_reasonable(rng):
    """The sparse loss is stochastic (fixed-shape redesign), so check
    behavioral properties rather than exact parity: perfectly matching
    descriptor maps under identity warp give ~zero positive loss; random maps
    give a clearly larger loss."""
    B, Hc, Wc, D = 2, 16, 16, 32
    H = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    mask = np.ones((B, Hc * 8, Wc * 8), np.float32)

    desc = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)

    key = jax.random.PRNGKey(0)
    loss_same = float(
        descriptor_loss_sparse(
            jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(H),
            key, num_samples_per_image=200, num_masked_non_matches_per_match=20,
        )
    )
    descw = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    descw /= np.linalg.norm(descw, axis=-1, keepdims=True)
    loss_diff = float(
        descriptor_loss_sparse(
            jnp.asarray(desc), jnp.asarray(descw), jnp.asarray(mask), jnp.asarray(H),
            key, num_samples_per_image=200, num_masked_non_matches_per_match=20,
        )
    )
    assert loss_diff > loss_same
    assert loss_same < 0.7  # identity positives: only the negative hinge term remains
