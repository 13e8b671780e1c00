"""Keypoint NMS parity: device simple_nms/extract vs the reference serial
`nms_fast` / `getPtsFromHeatmap` (set-based comparison, SURVEY.md §7)."""

import numpy as np
import jax.numpy as jnp

from yolopoint_tpu.ops import keypoints


def nms_fast_reference(in_corners, H: int, W: int, dist_thresh: int):
    """Test-only oracle: exact replica of the reference serial grid NMS
    (`/root/reference/src/utils/utils.py:118-182`). `in_corners` is `3xN`
    `[x, y, conf]`; returns surviving `3xN` + indices."""
    grid = np.zeros((H, W), int)
    inds = np.zeros((H, W), int)
    inds1 = np.argsort(-in_corners[2, :])
    corners = in_corners[:, inds1]
    rcorners = corners[:2, :].round().astype(int)
    if rcorners.shape[1] == 0:
        return np.zeros((3, 0)).astype(int), np.zeros(0).astype(int)
    if rcorners.shape[1] == 1:
        out = np.vstack((rcorners, in_corners[2])).reshape(3, 1)
        return out, np.zeros((1,)).astype(int)
    for i in range(rcorners.shape[1]):
        grid[rcorners[1, i], rcorners[0, i]] = 1
        inds[rcorners[1, i], rcorners[0, i]] = i
    pad = dist_thresh
    grid = np.pad(grid, ((pad, pad), (pad, pad)), mode="constant")
    for i in range(rcorners.shape[1]):
        pt = (rcorners[0, i] + pad, rcorners[1, i] + pad)
        if grid[pt[1], pt[0]] == 1:
            grid[pt[1] - pad:pt[1] + pad + 1, pt[0] - pad:pt[0] + pad + 1] = 0
            grid[pt[1], pt[0]] = -1
    keepy, keepx = np.where(grid == -1)
    keepy, keepx = keepy - pad, keepx - pad
    inds_keep = inds[keepy, keepx]
    out = corners[:, inds_keep]
    inds2 = np.argsort(-out[-1, :])
    out = out[:, inds2]
    out_inds = inds1[inds_keep[inds2]]
    return out, out_inds


def ref_get_pts_from_heatmap(heatmap, conf_thresh, nms_dist, border=4):
    """Oracle: /root/reference/src/utils/utils.py:465-485."""
    H, W = heatmap.shape
    xs, ys = np.where(heatmap >= conf_thresh)
    if len(xs) == 0:
        return np.zeros((3, 0))
    pts = np.zeros((3, len(xs)))
    pts[0], pts[1], pts[2] = ys, xs, heatmap[xs, ys]
    pts, _ = nms_fast_reference(pts, H, W, dist_thresh=nms_dist)
    inds = np.argsort(pts[2])
    pts = pts[:, inds[::-1]]
    rm = (
        (pts[0] < border)
        | (pts[0] >= W - border)
        | (pts[1] < border)
        | (pts[1] >= H - border)
    )
    return pts[:, ~rm]


def _random_heatmap(rng, H=64, W=80, n_peaks=60):
    hm = rng.uniform(0, 0.01, (H, W)).astype(np.float32)
    ys = rng.integers(0, H, n_peaks)
    xs = rng.integers(0, W, n_peaks)
    hm[ys, xs] = rng.uniform(0.1, 1.0, n_peaks)
    return hm


def test_extract_keypoints_matches_reference_set(rng):
    conf, radius = 0.05, 4
    hm = _random_heatmap(rng)
    ref = ref_get_pts_from_heatmap(hm, conf, radius)
    pts, scores, valid = keypoints.extract_keypoints(
        jnp.asarray(hm[None]), conf, radius, max_k=200, nms_iterations=4
    )
    pts, scores, valid = map(np.asarray, (pts[0], scores[0], valid[0]))
    ours = {(float(x), float(y)) for (x, y), v in zip(pts, valid) if v}
    theirs = {(float(x), float(y)) for x, y in ref[:2].T}
    # iterative NMS converges to the greedy set; allow a tiny tolerance on
    # pathological tie/chain configurations
    sym_diff = ours ^ theirs
    assert len(sym_diff) <= max(1, int(0.03 * max(len(theirs), 1))), (
        f"set mismatch: {len(sym_diff)} of {len(theirs)}"
    )


def test_extract_keypoints_scores_sorted(rng):
    hm = _random_heatmap(rng)
    _, scores, valid = keypoints.extract_keypoints(jnp.asarray(hm[None]), 0.05, 4, max_k=64)
    s = np.asarray(scores[0])
    assert (np.diff(s) <= 1e-6).all()
    assert (s[np.asarray(valid[0])] >= 0.05).all()


def test_border_removal(rng):
    hm = np.zeros((32, 32), np.float32)
    hm[2, 2] = 0.9  # inside border margin -> must be removed
    hm[16, 16] = 0.8
    pts, scores, valid = keypoints.extract_keypoints(jnp.asarray(hm[None]), 0.1, 4, max_k=8)
    v = np.asarray(valid[0])
    assert v.sum() == 1
    np.testing.assert_array_equal(np.asarray(pts[0])[v][0], [16, 16])


def test_simple_nms_idempotent_on_sparse(rng):
    """Isolated peaks (farther than radius) must all survive unchanged."""
    hm = np.zeros((40, 40), np.float32)
    coords = [(5, 5), (5, 25), (25, 5), (30, 30), (18, 18)]
    for i, (y, x) in enumerate(coords):
        hm[y, x] = 0.5 + 0.1 * i
    out = np.asarray(keypoints.simple_nms(jnp.asarray(hm[None]), 4))[0]
    np.testing.assert_allclose(out, hm)


def test_extract_keypoints_tie_plateaus_vs_reference(rng):
    """Tied-score plateaus and exact-tie peak pairs (VERDICT r1 weak #8):
    iterative `simple_nms` keeps ALL tied maxima of a neighbourhood while
    the reference's greedy conf-ordered `nms_fast` keeps one arbitrary tie
    member — the point SETS legitimately differ on exact ties. The bound
    that matters for downstream repeatability: every reference survivor must
    be matched by one of ours within the NMS radius at the SAME score (no
    corner is lost, localization shifts stay sub-radius), and spurious
    unmatched extras must stay rare."""
    conf, radius = 0.05, 4
    H, W = 96, 96
    hm = rng.uniform(0, 0.01, (H, W)).astype(np.float32)
    n = 40
    hm[rng.integers(0, H, n), rng.integers(0, W, n)] = rng.uniform(0.1, 1.0, n)
    for _ in range(6):  # 3x3 constant plateaus
        y, x = rng.integers(8, H - 12), rng.integers(8, W - 12)
        hm[y:y + 3, x:x + 3] = 0.5
    for _ in range(6):  # exact-tie peak pairs within the radius
        y, x = rng.integers(8, H - 16), rng.integers(8, W - 16)
        v = float(rng.uniform(0.2, 0.9))
        hm[y, x] = v
        hm[y + 2, x + 3] = v

    ref = ref_get_pts_from_heatmap(hm, conf, radius)
    pts, scores, valid = keypoints.extract_keypoints(
        jnp.asarray(hm[None]), conf, radius, max_k=300, nms_iterations=4
    )
    pts, scores, valid = map(np.asarray, (pts[0], scores[0], valid[0]))
    ours = pts[valid]
    our_scores = scores[valid]

    unmatched_ref = 0
    for (x, y, s) in ref.T:
        d = np.abs(ours - [x, y]).max(axis=1)
        near = d <= radius
        if not (near & np.isclose(our_scores, s, atol=1e-6)).any():
            unmatched_ref += 1
    assert unmatched_ref == 0, f"{unmatched_ref} reference corners lost"

    # extras beyond the reference count come only from kept ties
    extras = max(len(ours) - ref.shape[1], 0)
    assert extras <= 12 + 6  # at most the injected tie members
