"""Golden tests for geometry ops vs torch/reference-semantics oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from yolopoint_tpu.ops import geometry


def _rand_homography(rng, scale=0.1):
    H = np.eye(3) + rng.normal(0, scale, (3, 3)) * np.array(
        [[0.2, 0.2, 0.3], [0.2, 0.2, 0.3], [0.05, 0.05, 0.0]]
    )
    return H


def torch_warp_points(points, H):
    pts = torch.cat([torch.tensor(points).float(), torch.ones(len(points), 1)], dim=1)
    Ht = torch.tensor(H).float()
    w = (Ht @ pts.T).T
    return (w[:, :2] / w[:, 2:]).numpy()


def test_warp_points_matches_torch(rng):
    pts = rng.uniform(-1, 1, (50, 2))
    H = _rand_homography(rng)
    ours = np.asarray(geometry.warp_points(jnp.asarray(pts, jnp.float32), jnp.asarray(H, jnp.float32)))
    ref = torch_warp_points(pts, H)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_warp_points_batched(rng):
    pts = rng.uniform(-1, 1, (20, 2)).astype(np.float32)
    Hs = np.stack([_rand_homography(rng) for _ in range(4)]).astype(np.float32)
    ours = np.asarray(geometry.warp_points(jnp.asarray(pts), jnp.asarray(Hs)))
    assert ours.shape == (4, 20, 2)
    for b in range(4):
        np.testing.assert_allclose(ours[b], torch_warp_points(pts, Hs[b]), atol=1e-4)


def test_homography_scaling_roundtrip(rng):
    """Pixel-space H conjugation: warping pixel points through the scaled H
    equals normalizing, warping, denormalizing."""
    H, W = 48, 64
    Hn = _rand_homography(rng).astype(np.float32)
    pts_pix = rng.uniform(0, [W - 1, H - 1], (30, 2)).astype(np.float32)
    Hpix = geometry.homography_scaling(jnp.asarray(Hn), H, W)
    ours = np.asarray(geometry.warp_points(jnp.asarray(pts_pix), Hpix))
    # manual path
    norm = pts_pix * np.array([2.0 / W, 2.0 / H]) - 1.0
    warped_norm = torch_warp_points(norm, Hn)
    ref = (warped_norm + 1.0) / np.array([2.0 / W, 2.0 / H])
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_warp_image_matches_torch_grid_sample(rng, mode):
    """warp_image must reproduce the reference warp_image_batch
    (meshgrid in [-1,1] -> warp_points -> grid_sample align_corners=True)."""
    B, H, W, C = 2, 32, 40, 3
    img = rng.uniform(0, 1, (B, H, W, C)).astype(np.float32)
    Hs = np.stack([_rand_homography(rng, 0.05) for _ in range(B)]).astype(np.float32)

    ours = np.asarray(geometry.warp_image(jnp.asarray(img), jnp.asarray(Hs), mode=mode))

    # torch oracle (reference utils.py:333-376)
    img_t = torch.tensor(img).permute(0, 3, 1, 2)
    xs = torch.linspace(-1, 1, W)
    ys = torch.linspace(-1, 1, H)
    gx, gy = torch.meshgrid(xs, ys, indexing="ij")
    coords = torch.stack([gx, gy], dim=2).transpose(0, 1).reshape(-1, 2)  # (H*W, 2) x,y
    out_ref = []
    for b in range(B):
        src = torch_warp_points(coords.numpy(), Hs[b])
        grid = torch.tensor(src).reshape(1, H, W, 2).float()
        out = F.grid_sample(img_t[b : b + 1], grid, mode=mode, align_corners=True, padding_mode="zeros")
        out_ref.append(out[0].permute(1, 2, 0).numpy())
    ref = np.stack(out_ref)
    if mode == "nearest":
        # rounding ties can differ by one pixel; compare fraction of mismatches
        mismatch = np.mean(np.abs(ours - ref) > 1e-3)
        assert mismatch < 0.02
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_compute_valid_mask_identity():
    m = geometry.compute_valid_mask((16, 24), jnp.eye(3))
    m = np.asarray(m)
    assert m.shape == (1, 16, 24)
    assert m[0, 0].sum() == 0 and m[0, -1].sum() == 0  # 1px border zeroed
    assert m[0, 1:-1, 1:-1].min() == 1.0


def test_compute_valid_mask_pad_and_erosion(rng):
    H = _rand_homography(rng, 0.03).astype(np.float32)
    m = np.asarray(
        geometry.compute_valid_mask((32, 32), jnp.asarray(H), erosion_radius=3, pad=(2, 2, 4, 4))
    )[0]
    m_noero = np.asarray(
        geometry.compute_valid_mask((32, 32), jnp.asarray(H), erosion_radius=0, pad=(2, 2, 4, 4))
    )[0]
    assert m.sum() < m_noero.sum()  # erosion shrinks
    assert set(np.unique(m)) <= {0.0, 1.0}


def test_ellipse_kernel_matches_cv2():
    import cv2

    for r in (2, 3, 4, 8):
        ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r, 2 * r))
        ours = geometry.ellipse_kernel(r)
        np.testing.assert_array_equal(ours, ref)


def test_binary_erosion_matches_cv2(rng):
    import cv2

    mask = (rng.uniform(0, 1, (24, 24)) > 0.3).astype(np.float32)
    kernel = geometry.ellipse_kernel(2)
    ref = cv2.erode(mask, kernel.astype(np.uint8), iterations=1)
    ours = np.asarray(geometry.binary_erosion(jnp.asarray(mask[None]), kernel))[0]
    np.testing.assert_array_equal(ours, ref)


def test_warp_label_map_matches_reference_warplabels(rng):
    """warp_label_map vs the reference warpLabels (floor->warp->filter->scatter)."""
    Himg, Wimg = 40, 56
    n = 25
    pts = rng.uniform(0, [Wimg - 1, Himg - 1], (n, 2)).astype(np.float32)
    Hn = _rand_homography(rng, 0.05).astype(np.float32)
    Hinv = np.linalg.inv(Hn).astype(np.float32)

    labels, warped, valid = geometry.warp_label_map(
        jnp.asarray(pts), jnp.ones(n, bool), Himg, Wimg, jnp.asarray(Hinv)
    )
    labels = np.asarray(labels)

    # reference oracle
    pts_t = np.floor(pts)
    Hpix = np.asarray(geometry.homography_scaling(jnp.asarray(Hinv), Himg, Wimg))
    w = torch_warp_points(pts_t, Hpix)
    keep = (w >= 0).all(1) & (w[:, 0] <= Wimg - 1) & (w[:, 1] <= Himg - 1)
    canvas = np.zeros((Himg, Wimg), np.float32)
    wk = np.round(w[keep]).astype(int)
    canvas[np.clip(wk[:, 1], 0, Himg - 1), np.clip(wk[:, 0], 0, Wimg - 1)] = 1.0
    np.testing.assert_array_equal(labels, canvas)
    assert np.asarray(valid).sum() == keep.sum()


@pytest.mark.parametrize("margin", [0, 3])
@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_warped_pair_valid_mask_matches_gather_warp(rng, margin):
    """Closed-form pair mask == nearest-gather warp of the eroded base mask
    (the train step's aug path replaces the warp with coordinate math)."""
    from yolopoint_tpu.ops.homography import sample_homography_batch
    import jax

    B, Himg, Wimg = 3, 96, 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    h1 = sample_homography_batch(k1, B, patch_ratio=0.85, perspective=True,
                                 scaling=True, rotation=True, translation=True)
    h2 = sample_homography_batch(k2, B, patch_ratio=0.85, perspective=True,
                                 scaling=True, rotation=True, translation=True)

    base = geometry.compute_valid_mask((Himg, Wimg), h1, margin)
    ref = geometry.warp_image(base[..., None], h2, mode="nearest")[..., 0]
    got = geometry.warped_pair_valid_mask((Himg, Wimg), h1, h2, margin)

    # round-half float ties can flip isolated boundary pixels; demand
    # equality up to a vanishing fraction
    mismatch = float(np.abs(np.asarray(ref) - np.asarray(got)).mean())
    assert mismatch < 1e-3, mismatch


@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_warped_pair_valid_mask_identity_base():
    """h1 = identity, margin 0: the pair mask is the warped 1-px-interior
    mask (the `_identity_view` base case)."""
    import jax

    B, Himg, Wimg = 2, 64, 80
    from yolopoint_tpu.ops.homography import sample_homography_batch

    h1 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    h2 = sample_homography_batch(jax.random.PRNGKey(3), B, patch_ratio=0.9)
    base = jnp.zeros((B, Himg, Wimg), jnp.float32).at[:, 1:-1, 1:-1].set(1.0)
    ref = geometry.warp_image(base[..., None], h2, mode="nearest")[..., 0]
    got = geometry.warped_pair_valid_mask((Himg, Wimg), h1, h2, 0)
    mismatch = float(np.abs(np.asarray(ref) - np.asarray(got)).mean())
    assert mismatch < 1e-3, mismatch
