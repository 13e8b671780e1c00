"""Pallas fused NMS kernel parity (interpret mode on CPU) vs the XLA path.

The kernel (ops/pallas_nms.py) must reproduce the exact
threshold -> simple_nms -> border -> tile max/argmax chain of
`extract_keypoints`'s XLA branch — same semantics as the reference serial
`nms_fast` + `getPtsFromHeatmap` (`/root/reference/src/utils/utils.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolopoint_tpu.ops.keypoints import simple_nms
from yolopoint_tpu.ops.pallas_nms import nms_tile_reduce


def _xla_reference(hm, conf, r, iters, border, t):
    B, H, W = hm.shape
    x = jnp.where(hm >= conf, hm, 0.0)
    nmsed = simple_nms(x, r, iters)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ok = (xs >= border) & (xs < W - border) & (ys >= border) & (ys < H - border)
    masked = jnp.where(ok[None], nmsed, 0.0)
    tiles = masked.reshape(B, H // t, t, W // t, t).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(B, -1, t * t)
    return np.asarray(tiles.max(-1)), np.asarray(tiles.argmax(-1))


@pytest.mark.parametrize("hw", [(128, 128), (256, 192)])
def test_pallas_kernel_matches_xla(rng, hw):
    H, W = hw
    B, conf, r, iters, border, t = 2, 0.05, 4, 3, 4, 4
    hm = rng.uniform(0, 0.01, (B, H, W)).astype(np.float32)
    for b in range(B):
        n = 150
        ys = rng.integers(0, H, n)
        xs = rng.integers(0, W, n)
        hm[b, ys, xs] = rng.uniform(0.1, 1.0, n)

    ref_max, ref_arg = _xla_reference(jnp.asarray(hm), conf, r, iters, border, t)
    tmax, targ = nms_tile_reduce(jnp.asarray(hm), conf, r, iters, border, t,
                                 interpret=True)
    tmax, targ = np.asarray(tmax), np.asarray(targ)
    np.testing.assert_array_equal(tmax, ref_max)
    nz = ref_max > 0
    np.testing.assert_array_equal(targ[nz], ref_arg[nz])
    assert nz.sum() > 50  # the scene actually had survivors


@pytest.mark.parametrize("hw", [(128, 128), (256, 192), (640, 640)])
def test_fused_keys_kernel_matches_xla(rng, hw):
    """The in-kernel tile-key reduction (`nms_tile_keys`) must equal packing
    + pooling the XLA-suppressed map with `_tile_keys` exactly."""
    from yolopoint_tpu.ops.pallas_nms import _tile_keys, nms_tile_keys

    H, W = hw
    B, conf, r, iters, border, t = 2, 0.05, 4, 3, 4, 4
    hm = rng.uniform(0, 0.01, (B, H, W)).astype(np.float32)
    for b in range(B):
        n = 150
        ys = rng.integers(0, H, n)
        xs = rng.integers(0, W, n)
        hm[b, ys, xs] = rng.uniform(0.1, 1.0, n)

    x = jnp.where(jnp.asarray(hm) >= conf, jnp.asarray(hm), 0.0)
    nmsed = simple_nms(x, r, iters)
    xs_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ok = ((xs_i >= border) & (xs_i < W - border)
          & (ys_i >= border) & (ys_i < H - border))
    ref = np.asarray(_tile_keys(jnp.where(ok[None], nmsed, 0.0), t))

    got = np.asarray(nms_tile_keys(jnp.asarray(hm), conf, r, iters, border, t,
                                   interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert (ref > 0).sum() > 50
