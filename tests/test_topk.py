"""exact_top_k == lax.top_k (values always; indices up to ties).

The serving decode paths replaced `lax.top_k` (sort-based, 70.7 ms/batch on
the sparse serving confidence plane) with `exact_top_k`
(PartialReduce-based, 4.5 ms) — see yolopoint_tpu/ops/topk.py. These tests
pin the exactness contract on the three production distributions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolopoint_tpu.ops.topk import exact_top_k


def _check(x, k):
    ve, ie = jax.lax.top_k(x, k)
    for two_stage in (False, True):
        va, ia = exact_top_k(x, k, two_stage=two_stage)
        np.testing.assert_array_equal(np.asarray(ve), np.asarray(va))
        # indices must point at entries carrying the same value (tie-tolerant)
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(x), np.asarray(ia), -1),
            np.asarray(va),
        )


def test_sparse_sentinel_plane():
    """Serving conf plane: mostly -1.0 sentinel, few positives."""
    rng = np.random.default_rng(0)
    x = np.full((4, 2048), -1.0, np.float32)
    for b in range(4):
        idx = rng.choice(2048, rng.integers(10, 80), replace=False)
        x[b, idx] = rng.uniform(0.25, 1.0, idx.size).astype(np.float32)
    _check(jnp.asarray(x), 256)


def test_dense_uniform():
    rng = np.random.default_rng(1)
    _check(jnp.asarray(rng.uniform(0, 1, (3, 1024)).astype(np.float32)), 128)


def test_int32_packed_keys_bitcast():
    """Non-negative int32 keys (packed score|pos): float view is monotone."""
    rng = np.random.default_rng(2)
    x = np.zeros((2, 4096), np.int32)
    for b in range(2):
        idx = rng.choice(4096, 500, replace=False)
        # packed keys: f32 score bits in (0,1) -> < 0x3F800000
        x[b, idx] = rng.integers(1, 0x3F800000, 500).astype(np.int32)
    va, ia = exact_top_k(jnp.asarray(x), 600)
    ve, ie = jax.lax.top_k(jnp.asarray(x), 600)
    np.testing.assert_array_equal(np.asarray(ve), np.asarray(va))
    assert va.dtype == jnp.int32


def test_int32_denormal_view_keys():
    """Keys below 0x00800000 bitcast to DENORMAL floats, which the TPU VPU
    flushes to zero — the raw-bitcast formulation returned a wrong top-k set
    on-chip (caught by the r4 hardware verify). The 0x3F800000 bias maps
    every key into the normal range; values must match lax.top_k exactly."""
    rng = np.random.default_rng(6)
    x = np.zeros((3, 4096), np.int32)
    for b in range(3):
        idx = rng.choice(4096, 700, replace=False)
        x[b, idx] = rng.integers(1, 0x00800000, 700).astype(np.int32)
    va, _ = exact_top_k(jnp.asarray(x), 512)
    ve, _ = jax.lax.top_k(jnp.asarray(x), 512)
    np.testing.assert_array_equal(np.asarray(ve), np.asarray(va))


def test_under_vmap_1d():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (5, 512)).astype(np.float32))
    v, i = jax.vmap(lambda r: exact_top_k(r, 32))(x)
    ve, _ = jax.vmap(lambda r: jax.lax.top_k(r, 32))(x)
    np.testing.assert_array_equal(np.asarray(ve), np.asarray(v))


def test_rejects_unsafe_int_dtype():
    with pytest.raises(AssertionError):
        exact_top_k(jnp.zeros((4, 16), jnp.int16), 4)
