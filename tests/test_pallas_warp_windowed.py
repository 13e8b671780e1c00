"""Windowed-DMA MXU warp (ops/pallas_warp.py::warp_image_pallas_windowed):
interpret-mode parity against the exact XLA gather warp on the big shapes
the dense kernel cannot serve (480x640+, where the aug warps of the S@640
training step live). Hardware parity is covered by
tests/test_tpu_parity.py::test_windowed_warp_on_hardware."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolopoint_tpu.ops.geometry import _warp_image_xla  # noqa: E402
from yolopoint_tpu.ops.homography import sample_homography_np  # noqa: E402
from yolopoint_tpu.ops.pallas_warp import (  # noqa: E402
    warp_fits_windowed, warp_image_pallas_windowed,
)


def _batch_homs(B, H, W, seed0=0, **kw):
    return jnp.asarray(
        np.stack([sample_homography_np((H, W), seed=seed0 + i, **kw)
                  for i in range(B)]), jnp.float32)


# fast-tier cases use small grids (the kernel logic is shape-generic: the
# window clamps to the image via _window_dims); the serving-scale 480x640
# case lives in the slow tier and on-hardware in tests/test_tpu_parity.py
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("shape", [(2, 192, 384, 3), (1, 96, 256, 1)])
def test_windowed_matches_xla(mode, shape):
    B, H, W, C = shape
    assert warp_fits_windowed(shape, mode)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    hom = _batch_homs(B, H, W, patch_ratio=0.85, perspective=True,
                      scaling=True, rotation=True, translation=True)
    got = np.asarray(warp_image_pallas_windowed(img, hom, mode, interpret=True))
    ref = np.asarray(_warp_image_xla(img, hom, mode))
    # nearest selection is exact (0/1 weights) but values quantize through
    # the bf16 window planes; bilinear adds the bf16 tap envelope
    tol = 2e-3 if mode == "nearest" else 6e-3
    assert np.abs(got - ref).max() <= tol


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["bilinear"])
def test_windowed_serving_shape(mode):
    """Full 480x640 serving-shape parity (compile-heavy: slow tier)."""
    B, H, W, C = 2, 480, 640, 3
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.float32)
    hom = _batch_homs(B, H, W, patch_ratio=0.85, perspective=True,
                      scaling=True, rotation=True, translation=True)
    got = np.asarray(warp_image_pallas_windowed(img, hom, mode, interpret=True))
    ref = np.asarray(_warp_image_xla(img, hom, mode))
    assert np.abs(got - ref).max() <= 6e-3


def test_windowed_identity_and_shift():
    """Identity H reproduces the image; a large translation still resolves
    (window origins track the tiles wherever the homography sends them)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 192, 384, 3)), jnp.float32)
    eye = jnp.eye(3)[None]
    out = np.asarray(warp_image_pallas_windowed(img, eye, "bilinear",
                                                interpret=True))
    assert np.abs(out - np.asarray(img)).max() <= 4e-3

    # normalized-coords translation by half a frame
    t = jnp.asarray([[[1.0, 0.0, 0.5], [0.0, 1.0, 0.25], [0.0, 0.0, 1.0]]])
    got = np.asarray(warp_image_pallas_windowed(img, t, "nearest",
                                                interpret=True))
    ref = np.asarray(_warp_image_xla(img, t, "nearest"))
    # nearest selection is exact; values quantize through the bf16 window
    assert np.abs(got - ref).max() <= 2e-3


def test_windowed_gate():
    assert warp_fits_windowed((2, 480, 640, 3))
    assert warp_fits_windowed((2, 640, 640, 3))
    assert not warp_fits_windowed((2, 480, 640, 65))    # C > 4 (heatmaps)
    assert not warp_fits_windowed((2, 250, 320, 3))     # H % TILE_H != 0
