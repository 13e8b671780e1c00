"""Interpret-mode parity tests for the Pallas box-NMS and MXU-gather kernels
(the TPU serving fast paths; CPU tests run them through the Pallas
interpreter against the exact XLA implementations)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolopoint_tpu.ops.nms import _greedy_nms_keep
from yolopoint_tpu.ops.pallas_box_nms import pallas_greedy_nms
from yolopoint_tpu.ops.pallas_gather import sample_descriptors_pallas
from yolopoint_tpu.ops.sampling import sample_descriptors


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("K,iou", [(256, 0.45), (512, 0.6)])
def test_pallas_greedy_nms_matches_xla(rng, K, iou):
    B = 3
    ctr = rng.uniform(0, 640, (B, K, 2))
    wh = rng.uniform(5, 150, (B, K, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=-1).astype(np.float32)
    valid = rng.uniform(size=(B, K)) < 0.85
    keep_p = pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(valid), iou, interpret=True)
    keep_x = jax.vmap(_greedy_nms_keep, in_axes=(0, 0, None))(
        jnp.asarray(boxes), jnp.asarray(valid), iou
    )
    assert np.array_equal(np.asarray(keep_p), np.asarray(keep_x))


def test_pallas_greedy_nms_dense_chain(rng):
    """Adversarial overlapping chain (every box overlaps its neighbors):
    greedy must keep alternating boxes; long suppression chains exercise the
    Gauss-Seidel block boundaries."""
    K = 256
    x = np.arange(K, dtype=np.float32) * 4.0
    boxes = np.stack([x, np.zeros(K, np.float32), x + 10.0, np.full(K, 10.0, np.float32)], axis=-1)
    valid = np.ones(K, bool)
    keep_p = pallas_greedy_nms(boxes[None], valid[None], 0.3, interpret=True)
    keep_x = _greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.3)
    assert np.array_equal(np.asarray(keep_p)[0], np.asarray(keep_x))


def test_mxu_descriptor_sampling_matches_exact(rng):
    B, Hc, Wc, D, N = 2, 40, 40, 128, 200
    desc = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    pts = rng.uniform(0, 319, (B, N, 2)).astype(np.float32)
    fast = sample_descriptors_pallas(jnp.asarray(desc), jnp.asarray(pts), interpret=True)
    exact = sample_descriptors(jnp.asarray(desc), jnp.asarray(pts))
    a, b = np.asarray(fast), np.asarray(exact)
    # bf16 matmul: unit descriptors agree to ~1e-3
    assert np.abs(a - b).max() < 5e-3
    assert (a * b).sum(-1).min() > 0.9999
