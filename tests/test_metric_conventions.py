"""Homography-correctness / repeatability convention gates (VERDICT r2 #7).

The round-2 runs logged validation homography_correctness ~0.0 with no proof
the metric itself was sound. These tests feed the metrics PERFECT synthetic
correspondences under non-trivial known homographies — including warps drawn
from the training pipeline's own `sample_homography_np` across a `max_angle`
sweep — and require correctness 1.0 / repeatability 1.0. If these pass, a
near-zero validation number means the model's matches fail under those warps
(warp harshness / insufficient training), not a convention bug.

Reference semantics: `compute_homography`
(`/root/reference/src/evaluations/descriptor_evaluation.py:45-146`) estimates
base->warped in PIXELS and compares against `inv_homography` conjugated from
normalized coords; `homography` is the warped->base sampling map of the
inverse warp (`/root/reference/src/datasets/DataClasses.py:319`).
"""

from __future__ import annotations

import numpy as np
import pytest

from yolopoint_tpu.evaluation.descriptor_eval import compute_homography_correctness
from yolopoint_tpu.evaluation.detector_eval import (
    compute_repeatability,
    homography_scaling_np,
    warp_keypoints_np,
)
from yolopoint_tpu.ops.homography import sample_homography_np

H_IMG, W_IMG = 240, 320


def _norm_from_pixel(H_pix: np.ndarray) -> np.ndarray:
    """Normalized-coords twin of a pixel homography: inverse conjugation of
    `homography_scaling_np` (trans @ H_pix @ trans^-1)."""
    trans = np.array([[2.0 / W_IMG, 0, -1], [0, 2.0 / H_IMG, -1], [0, 0, 1.0]])
    return trans @ H_pix @ np.linalg.inv(trans)


def _unit_desc(rng, n, d=64):
    v = rng.normal(size=(n, d))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _perfect_pair(inv_h_norm: np.ndarray, n=300, seed=0):
    """Keypoints + exactly-corresponding warped keypoints + identical
    descriptors under a base->warped normalized homography, keeping only
    pairs where the warped point stays in frame."""
    rng = np.random.default_rng(seed)
    kp = rng.uniform(5, [W_IMG - 5, H_IMG - 5], (n, 2))
    wkp = warp_keypoints_np(kp, inv_h_norm, (H_IMG, W_IMG))
    ok = (
        (wkp[:, 0] >= 0) & (wkp[:, 0] < W_IMG)
        & (wkp[:, 1] >= 0) & (wkp[:, 1] < H_IMG)
    )
    kp, wkp = kp[ok], wkp[ok]
    scores = np.linspace(1.0, 0.5, len(kp))[:, None]
    desc = _unit_desc(rng, len(kp))
    return (
        np.concatenate([kp, scores], axis=1),
        np.concatenate([wkp, scores], axis=1),
        desc,
    )


def test_correctness_one_under_known_nontrivial_h():
    """Rotation + perspective + translation, perfect matches -> 1.0."""
    th = 0.15
    rot = np.array(
        [[np.cos(th), -np.sin(th), 8.0], [np.sin(th), np.cos(th), -5.0],
         [1e-4, -5e-5, 1.0]]
    )
    inv_h = _norm_from_pixel(rot)
    kp, wkp, desc = _perfect_pair(inv_h)
    assert len(kp) >= 100
    out = compute_homography_correctness(
        kp, wkp, desc, desc, inv_h, (H_IMG, W_IMG), keep_k_points=300
    )
    assert out["correctness"] == 1.0
    assert out["mean_dist"] < 0.5
    assert out["matching_score"] > 0.9


@pytest.mark.parametrize("max_angle", [0.2, 0.8, 1.57])
def test_correctness_survives_max_angle_sweep(max_angle):
    """Warps from the training pipeline's own sampler at increasing
    `max_angle` (1.57 = the harsh synth_r5 validation setting): with perfect
    correspondences the metric stays 1.0 at every harshness — so a ~0
    validation value indicts the matches, not the metric."""
    for seed in range(3):
        # homography = warped->base (the sampling map); inv = base->warped
        hom = sample_homography_np(
            (2, 2), shift=-1, patch_ratio=0.85, max_angle=max_angle,
            perspective_amplitude_x=0.2, perspective_amplitude_y=0.2,
            scaling_amplitude=0.2, seed=seed,
        )
        inv_h = np.linalg.inv(hom)
        kp, wkp, desc = _perfect_pair(inv_h, seed=seed)
        if len(kp) < 50:  # extreme warp pushed everything out of frame
            continue
        out = compute_homography_correctness(
            kp, wkp, desc, desc, inv_h, (H_IMG, W_IMG), keep_k_points=300
        )
        assert out["correctness"] == 1.0, (max_angle, seed, out["mean_dist"])

        rep, loc_err = compute_repeatability(
            kp, wkp, hom, inv_h, (H_IMG, W_IMG), keep_k_points=300
        )
        assert rep > 0.95, (max_angle, seed, rep)
        assert 0 <= loc_err < 1.0


def test_correctness_zero_with_broken_matches():
    """Scrambled descriptors (no true correspondence signal) -> the estimated
    H is garbage and correctness must be 0."""
    rng = np.random.default_rng(7)
    hom = sample_homography_np((2, 2), shift=-1, patch_ratio=0.85, seed=1)
    inv_h = np.linalg.inv(hom)
    kp, wkp, _ = _perfect_pair(inv_h, seed=1)
    # independent random descriptors per view + shuffled warped points
    d1 = _unit_desc(rng, len(kp))
    d2 = _unit_desc(rng, len(kp))
    perm = rng.permutation(len(kp))
    out = compute_homography_correctness(
        kp, wkp[perm], d1, d2, inv_h, (H_IMG, W_IMG), keep_k_points=300
    )
    assert out["correctness"] == 0.0


def test_correctness_is_threshold_sharp():
    """A pure-translation mismatch just over/under the corner threshold flips
    the verdict — pins the <= 3px mean-corner-error semantics."""
    inv_h = _norm_from_pixel(np.eye(3))
    kp, wkp, desc = _perfect_pair(inv_h, seed=3)
    for shift, expect in [(2.0, 1.0), (4.0, 0.0)]:
        shifted = wkp.copy()
        shifted[:, 0] += shift  # estimated H becomes translation-by-shift
        out = compute_homography_correctness(
            kp, shifted, desc, desc, inv_h, (H_IMG, W_IMG), keep_k_points=300,
            correctness_thresh=3.0,
        )
        assert out["correctness"] == expect, (shift, out["mean_dist"])
        # mean corner error equals the injected shift
        assert out["mean_dist"] == pytest.approx(shift, abs=0.3)


def test_scaling_roundtrip_convention():
    """homography_scaling_np(_norm_from_pixel(H)) == H — the conjugation the
    metric applies to `inv_homography` before comparing corners."""
    H_pix = np.array([[1.1, 0.03, 12.0], [-0.02, 0.94, 3.0], [1e-4, 2e-5, 1.0]])
    back = homography_scaling_np(_norm_from_pixel(H_pix), H_IMG, W_IMG)
    np.testing.assert_allclose(back, H_pix, rtol=1e-9, atol=1e-9)
