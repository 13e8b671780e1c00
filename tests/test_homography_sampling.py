"""Homography sampling + perspective solve parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolopoint_tpu.ops import homography as hg
from yolopoint_tpu.ops.geometry import warp_points


def test_perspective_transform_matches_cv2(rng):
    import cv2

    for _ in range(10):
        src = rng.uniform(0, 100, (4, 2)).astype(np.float32)
        dst = (src + rng.uniform(-10, 10, (4, 2))).astype(np.float32)
        ref = cv2.getPerspectiveTransform(src, dst)
        ours = np.asarray(hg.perspective_transform(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
        ours_np = hg.perspective_transform_np(src, dst)
        np.testing.assert_allclose(ours_np, ref, rtol=1e-4, atol=1e-4)


def test_sample_homography_np_maps_unit_frame(rng):
    """Sampled H (normalized convention) must map the output frame into the
    input frame without artifacts when allow_artifacts=False."""
    for seed in range(5):
        H = hg.sample_homography_np((2, 2), shift=-1, seed=seed)
        corners = np.array([[-1, -1], [-1, 1], [1, 1], [1, -1]], np.float64)
        c_h = np.concatenate([corners, np.ones((4, 1))], 1)
        w = (H @ c_h.T).T
        w = w[:, :2] / w[:, 2:]
        assert (w >= -1 - 1e-6).all() and (w <= 1 + 1e-6).all()


def test_sample_homography_np_seeded_deterministic():
    H1 = hg.sample_homography_np((2, 2), shift=-1, seed=42)
    H2 = hg.sample_homography_np((2, 2), shift=-1, seed=42)
    np.testing.assert_array_equal(H1, H2)


def test_sample_homography_crop_branch():
    crop = {"tl": (10, 20), "H_crop": 64, "W_crop": 96, "HW_full": (128, 256)}
    H, H_big = hg.sample_homography_np((2, 2), shift=-1, crop_pts=crop, seed=1)
    assert H.shape == (3, 3) and H_big.shape == (3, 3)


@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_sample_homography_batch_valid(rng):
    key = jax.random.PRNGKey(0)
    Hs = hg.sample_homography_batch(key, 16)
    assert Hs.shape == (16, 3, 3)
    corners = jnp.array([[-1, -1], [-1, 1], [1, 1], [1, -1]], jnp.float32)
    warped = warp_points(corners, Hs)  # (16, 4, 2)
    w = np.asarray(warped)
    # translation can land exactly on the frame border; allow f32 slack
    assert (w >= -1 - 5e-3).all() and (w <= 1 + 5e-3).all()
    # batch entries must differ (rng actually used)
    assert np.std(w, axis=0).max() > 1e-3


def test_sample_homography_batch_identity_when_disabled():
    key = jax.random.PRNGKey(0)
    Hs = hg.sample_homography_batch(
        key, 2, perspective=False, scaling=False, rotation=False, translation=False
    )
    np.testing.assert_allclose(np.asarray(Hs), np.eye(3)[None].repeat(2, 0), atol=1e-5)
