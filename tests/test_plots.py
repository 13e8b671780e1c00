"""Reporting stack: PR/F1 curves, confusion heatmap, image panels, match viz
(reference `metrics_yolo.py:302-341`, `plots_yolo.py`, `draw.py`)."""

import numpy as np
import pytest

from yolopoint_tpu.evaluation.plots import (
    draw_detections,
    plot_confusion_matrix,
    plot_matches,
    plot_pr_curves,
    plot_val_panel,
)
from yolopoint_tpu.evaluation.yolo_eval import ConfusionMatrix, ap_per_class


def test_curves_and_confusion_pngs(tmp_path, rng):
    n = 200
    tp = rng.random((n, 10)) > 0.4
    conf = rng.random(n).astype(np.float32)
    pred_cls = rng.integers(0, 3, n).astype(np.float32)
    target_cls = rng.integers(0, 3, 120).astype(np.float32)
    *_, curves = ap_per_class(tp, conf, pred_cls, target_cls, return_curves=True)
    assert curves["pr"].shape[1] == 101

    plot_pr_curves(curves, ["car", "ped", "bike"], tmp_path)
    for name in ("PR_curve", "F1_curve", "Precision_curve", "Recall_curve"):
        f = tmp_path / f"{name}.png"
        assert f.exists() and f.stat().st_size > 1000, name

    cm = ConfusionMatrix(nc=3)
    dets = np.array([[10, 10, 40, 40, 0.9, 0], [60, 60, 90, 90, 0.8, 1]])
    labels = np.array([[0, 12, 12, 38, 38], [2, 100, 100, 120, 120]])
    cm.process_batch(dets, labels)
    plot_confusion_matrix(cm.matrix, ["car", "ped", "bike"], tmp_path / "cm.png")
    assert (tmp_path / "cm.png").stat().st_size > 1000


def test_panel_and_matches(tmp_path, rng):
    img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    dets = {
        "boxes": np.array([[10, 10, 60, 50], [70, 20, 120, 80]], np.float32),
        "scores": np.array([0.9, 0.7], np.float32),
        "classes": np.array([0, 1]),
        "valid": np.array([True, True]),
    }
    kps = rng.uniform(5, 90, (30, 2)).astype(np.float32)
    annotated = draw_detections(img, dets["boxes"], dets["scores"], dets["classes"],
                                ["a", "b"], keypoints=kps)
    assert annotated.dtype == np.uint8 and annotated.shape == (96, 128, 3)

    plot_val_panel(img, dets, ["a", "b"], tmp_path / "panel.png", keypoints=kps)
    assert (tmp_path / "panel.png").stat().st_size > 1000

    pa = rng.uniform(0, 90, (20, 2))
    pb = pa + rng.normal(0, 2, (20, 2))
    plot_matches(img, img, pa, pb, tmp_path / "matches.png")
    assert (tmp_path / "matches.png").stat().st_size > 1000
