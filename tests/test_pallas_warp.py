"""Pallas MXU warp kernel parity (interpret mode on CPU) vs the exact XLA
gather warp (`ops.geometry._warp_image_xla`, the reference
`warp_image_batch` semantics — `/root/reference/src/utils/utils.py:333-376`).

The kernel quantizes taps/weights to bf16 (documented <=0.4%-of-range
error); nearest mode uses 0/1 weights and must be EXACT. Compiled-Mosaic
parity on real hardware lives in tests/test_tpu_parity.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yolopoint_tpu.ops.geometry import _warp_image_xla
from yolopoint_tpu.ops.homography import sample_homography_batch
from yolopoint_tpu.ops.pallas_warp import warp_fits_pallas, warp_image_pallas

import jax


def _random_homs(rng, B):
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    H = sample_homography_batch(key, B)
    return jnp.asarray(np.linalg.inv(np.asarray(H)))


@pytest.mark.parametrize("C", [1, 3])
def test_bilinear_matches_xla_within_bf16(rng, C):
    B, H, W = 3, 64, 128
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
    hom = _random_homs(rng, B)
    assert warp_fits_pallas(img.shape)
    got = np.asarray(warp_image_pallas(img, hom, "bilinear", interpret=True))
    ref = np.asarray(_warp_image_xla(img, hom, "bilinear"))
    # bf16 taps and weights: <=0.4% of the value range, on the vast majority
    # of pixels much tighter
    assert np.abs(got - ref).max() < 8e-3
    assert np.abs(got - ref).mean() < 1e-3


def test_nearest_is_exact(rng):
    B, H, W, C = 2, 64, 128, 3
    # u8-valued content: nearest warp must reproduce source values exactly
    img = jnp.asarray(
        rng.integers(0, 256, (B, H, W, C)).astype(np.float32))
    hom = _random_homs(rng, B)
    got = np.asarray(warp_image_pallas(img, hom, "nearest", interpret=True))
    ref = np.asarray(_warp_image_xla(img, hom, "nearest"))
    np.testing.assert_array_equal(got, ref)


def test_identity_homography_roundtrip(rng):
    B, H, W, C = 2, 32, 128, 1
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    got = np.asarray(warp_image_pallas(img, eye, "bilinear", interpret=True))
    # identity: integer source coords, bilinear weights are exact {0,1}
    np.testing.assert_allclose(got, np.asarray(img), atol=4e-3)


def test_zero_padding_outside_frame(rng):
    """Translation pushing half the frame out: out-of-frame outputs are 0."""
    B, H, W, C = 1, 32, 128, 1
    img = jnp.ones((B, H, W, C), jnp.float32)
    # normalized-coords translation by +1.0 in x (half the frame, since the
    # frame spans [-1, 1])
    hom = jnp.asarray(
        [[[1.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    got = np.asarray(warp_image_pallas(img, hom, "bilinear", interpret=True))
    ref = np.asarray(_warp_image_xla(img, hom, "bilinear"))
    np.testing.assert_allclose(got, ref, atol=4e-3)
    assert got[0, :, -8:, 0].max() == 0.0  # right strip reads past the frame
    assert got[0, :, :8, 0].min() > 0.99


def test_vmem_gate_rejects_oversize():
    # 4k x 4k x 4 channels cannot hold image planes + weights in VMEM
    assert not warp_fits_pallas((1, 4096, 4096, 4))
    assert not warp_fits_pallas((1, 256, 320, 64))  # C > 4
