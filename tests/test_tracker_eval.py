"""PointTracker + evaluation metric tests."""

import numpy as np

from yolopoint_tpu.evaluation.descriptor_eval import (
    compute_homography_correctness,
    mutual_match_np,
    ransac_homography_np,
)
from yolopoint_tpu.evaluation.detector_eval import compute_repeatability
from yolopoint_tpu.evaluation.yolo_eval import (
    ConfusionMatrix,
    ap_per_class,
    combined_fitness,
    compute_ap,
    process_batch,
)
from yolopoint_tpu.frontend.tracker import PointTracker


def _unit_desc(rng, n, d=32):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_tracker_continuous_points(rng):
    """Same physical points across frames must form tracks of full length."""
    n = 20
    desc = _unit_desc(rng, n)
    pts = rng.uniform(0, 100, (n, 2))
    tracker = PointTracker(max_length=4, nn_thresh=0.7)
    for f in range(4):
        jitter = rng.normal(0, 0.5, (n, 2))
        tracker.update(np.vstack([(pts + jitter).T, np.ones(n)]), desc.T)
    tracks = tracker.get_tracks(min_length=3)
    assert len(tracks) == n
    assert (tracks[:, 2:] >= 0).all()


def test_tracker_new_points_spawn_tracks(rng):
    tracker = PointTracker(max_length=3, nn_thresh=0.7)
    d1 = _unit_desc(rng, 10)
    tracker.update(rng.uniform(0, 50, (3, 10)), d1.T)
    d2 = _unit_desc(rng, 15)  # completely new descriptors
    tracker.update(rng.uniform(0, 50, (3, 15)), d2.T)
    # old tracks lose their head, new tracks exist for the 15 new points
    assert tracker.track_count == 25
    heads = tracker.get_tracks(min_length=1)
    assert len(heads) == 15


def test_repeatability_perfect_case(rng):
    """Identity homography + identical points => repeatability 1."""
    pts = np.concatenate([rng.uniform(10, 90, (50, 2)), rng.uniform(0.5, 1, (50, 1))], 1)
    eye = np.eye(3)
    rep, loc = compute_repeatability(pts.copy(), pts.copy(), eye, eye, (100, 100))
    assert rep == 1.0
    assert loc < 1e-6


def test_repeatability_disjoint_points(rng):
    a = np.concatenate([rng.uniform(5, 20, (20, 2)), rng.uniform(0.5, 1, (20, 1))], 1)
    b = np.concatenate([rng.uniform(60, 90, (20, 2)), rng.uniform(0.5, 1, (20, 1))], 1)
    eye = np.eye(3)
    rep, _ = compute_repeatability(a, b, eye, eye, (100, 100))
    assert rep == 0.0


def test_homography_correctness_identity(rng):
    """Matching descriptors at identical locations under identity H."""
    n = 60
    pts = np.concatenate([rng.uniform(10, 400, (n, 2)), rng.uniform(0.5, 1, (n, 1))], 1)
    desc = _unit_desc(rng, n, 64)
    out = compute_homography_correctness(
        pts, pts, desc, desc, np.eye(3), (480, 640), keep_k_points=n
    )
    assert out["correctness"] == 1.0
    assert out["mean_dist"] < 1.0
    assert out["matching_score"] > 0.5


def test_ransac_homography_recovers_truth(rng):
    H_true = np.array([[1.05, 0.02, 5.0], [-0.01, 0.98, -3.0], [1e-5, -2e-5, 1.0]])
    src = rng.uniform(0, 400, (80, 2))
    src_h = np.concatenate([src, np.ones((80, 1))], 1)
    dst = src_h @ H_true.T
    dst = dst[:, :2] / dst[:, 2:]
    dst[:15] += rng.uniform(20, 50, (15, 2))  # outliers
    H_est, inliers = ransac_homography_np(src, dst, thresh=2.0, iters=500)
    assert H_est is not None
    assert inliers.sum() >= 60
    np.testing.assert_allclose(H_est / H_est[2, 2], H_true, rtol=0.05, atol=0.5)


def test_mutual_match_symmetric(rng):
    d1 = _unit_desc(rng, 30)
    pairs, dist = mutual_match_np(d1, d1)
    assert len(pairs) == 30
    np.testing.assert_array_equal(pairs[:, 0], pairs[:, 1])
    assert (dist < 1e-3).all()


def test_map_stack_perfect_detections(rng):
    """Detections identical to labels => mAP 1.0 at all IoU levels."""
    iouv = np.linspace(0.5, 0.95, 10)
    n = 20
    xy = rng.uniform(0, 400, (n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(20, 60, (n, 2))], 1)
    cls = rng.integers(0, 3, n).astype(float)
    labels = np.concatenate([cls[:, None], boxes], 1)
    dets = np.concatenate([boxes, np.full((n, 1), 0.9), cls[:, None]], 1)
    correct = process_batch(dets, labels, iouv)
    assert correct.all()
    _, _, p, r, f1, ap, _ = ap_per_class(correct, dets[:, 4], cls, cls)
    assert ap.mean() > 0.99
    assert combined_fitness(1.0, 1.0, 0.1 * 1 + 0.9 * 1) == 1.0


def test_compute_ap_known_curve():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    ap, _, _ = compute_ap(recall, precision)
    assert 0.99 <= ap <= 1.01


def test_confusion_matrix_counts(rng):
    cm = ConfusionMatrix(nc=3)
    labels = np.array([[0, 10, 10, 50, 50], [1, 100, 100, 150, 150]], float)
    dets = np.array(
        [[10, 10, 50, 50, 0.9, 0], [200, 200, 240, 240, 0.8, 2]], float
    )
    cm.process_batch(dets, labels)
    assert cm.matrix[0, 0] == 1      # correct class 0
    assert cm.matrix[3, 1] == 1      # class-1 label missed (background FP row)
    assert cm.matrix[2, 3] == 1      # spurious class-2 det (background FN col)
