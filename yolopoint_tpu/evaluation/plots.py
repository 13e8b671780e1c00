"""Validation reporting: PR/F1/P/R curves, confusion-matrix heatmap, and
annotated image panels.

TPU-free host-side rendering covering the reference plotting stack
(`/root/reference/src/utils/metrics_yolo.py:175-195,302-341` confusion +
metric curves, `/root/reference/src/utils/plots_yolo.py` box panels,
`/root/reference/src/utils/draw.py` keypoint/match drawing). Matplotlib is
imported lazily and every entry point degrades to a no-op warning if it is
unavailable, so headless training never breaks on plotting.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Optional, Sequence

import numpy as np


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def _finish(fig, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)


def _legend_names(classes: np.ndarray, names: Sequence[str]) -> list[str]:
    return [names[c] if c < len(names) else str(c) for c in classes]


def plot_pr_curves(
    curves: Mapping[str, np.ndarray],
    names: Sequence[str],
    directory: str | Path,
    prefix: str = "",
) -> None:
    """Write PR, F1, P and R curve PNGs from `ap_per_class(return_curves=True)`
    output (reference `plot_pr_curve`/`plot_mc_curve`,
    `metrics_yolo.py:302-341`)."""
    plt = _mpl()
    if plt is None:
        return
    directory = Path(directory)
    cls_names = _legend_names(curves["classes"], names)
    show_legend = len(cls_names) <= 20  # reference hides legends for >20 classes

    fig, ax = plt.subplots(figsize=(9, 6))
    for ci, name in enumerate(cls_names):
        ax.plot(curves["pr_x"], curves["pr"][ci], linewidth=1,
                label=f"{name} {curves['ap50'][ci]:.3f}" if show_legend else None)
    ax.plot(curves["pr_x"], curves["pr"].mean(0), linewidth=3, color="blue",
            label=f"all classes {curves['ap50'].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall"); ax.set_ylabel("Precision")
    ax.set_xlim(0, 1); ax.set_ylim(0, 1)
    ax.legend(loc="lower left", fontsize=8)
    _finish(fig, directory / f"{prefix}PR_curve.png")

    for key, ylabel in (("f1", "F1"), ("p", "Precision"), ("r", "Recall")):
        fig, ax = plt.subplots(figsize=(9, 6))
        for ci, name in enumerate(cls_names):
            ax.plot(curves["px"], curves[key][ci], linewidth=1,
                    label=name if show_legend else None)
        mean = curves[key].mean(0)
        best = mean.argmax()
        ax.plot(curves["px"], mean, linewidth=3, color="blue",
                label=f"all classes {mean[best]:.2f} at {curves['px'][best]:.3f}")
        ax.set_xlabel("Confidence"); ax.set_ylabel(ylabel)
        ax.set_xlim(0, 1); ax.set_ylim(0, 1)
        ax.legend(loc="lower left", fontsize=8)
        _finish(fig, directory / f"{prefix}{ylabel}_curve.png")


def plot_confusion_matrix(
    matrix: np.ndarray,
    names: Sequence[str],
    path: str | Path,
    normalize: bool = True,
) -> None:
    """Confusion-matrix heatmap PNG (reference `ConfusionMatrix.plot`,
    `metrics_yolo.py:175-195`)."""
    plt = _mpl()
    if plt is None:
        return
    m = np.asarray(matrix, np.float64)
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    nc = m.shape[0] - 1
    labels = list(names[:nc]) + [str(i) for i in range(len(names), nc)] + ["background"]
    fig, ax = plt.subplots(figsize=(max(6, nc * 0.6), max(5, nc * 0.5)))
    im = ax.imshow(m, cmap="Blues", vmin=0.0)
    fig.colorbar(im, ax=ax)
    if nc <= 30:
        for i in range(m.shape[0]):
            for j in range(m.shape[1]):
                if m[i, j] > 0.005:
                    ax.text(j, i, f"{m[i, j]:.2f}", ha="center", va="center",
                            fontsize=7, color="black" if m[i, j] < 0.6 else "white")
    ax.set_xticks(range(len(labels)), labels, rotation=90, fontsize=8)
    ax.set_yticks(range(len(labels)), labels, fontsize=8)
    ax.set_xlabel("True"); ax.set_ylabel("Predicted")
    _finish(fig, Path(path))


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    names: Sequence[str],
    keypoints: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Annotate a HWC float/uint8 image with xyxy boxes (+labels) and
    keypoints; returns a uint8 RGB array (reference Annotator usage
    `/root/reference/src/train.py:409-431`, `draw.py`)."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if img.ndim == 2 or img.shape[-1] == 1:
        img = np.repeat(img.reshape(*img.shape[:2], 1), 3, axis=-1)
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]

    rng = np.random.default_rng(7)
    palette = rng.integers(64, 255, (max(len(names), 1), 3))

    def rect(y0, x0, y1, x1, color):
        y0, y1 = int(np.clip(y0, 0, h - 1)), int(np.clip(y1, 0, h - 1))
        x0, x1 = int(np.clip(x0, 0, w - 1)), int(np.clip(x1, 0, w - 1))
        img[y0:y1 + 1, x0] = color
        img[y0:y1 + 1, x1] = color
        img[y0, x0:x1 + 1] = color
        img[y1, x0:x1 + 1] = color

    for box, cls in zip(np.asarray(boxes), np.asarray(classes).astype(int)):
        x1, y1, x2, y2 = box[:4]
        rect(y1, x1, y2, x2, palette[cls % len(palette)])

    if keypoints is not None:
        for x, y in np.asarray(keypoints)[:, :2]:
            yi, xi = int(round(y)), int(round(x))
            if 1 <= yi < h - 1 and 1 <= xi < w - 1:
                img[yi - 1:yi + 2, xi - 1:xi + 2] = (0, 255, 0)
    return img


def plot_val_panel(
    image: np.ndarray,
    dets: Mapping[str, np.ndarray],
    names: Sequence[str],
    path: str | Path,
    keypoints: Optional[np.ndarray] = None,
) -> None:
    """Save one annotated validation image (detections + keypoints) — the TB
    image panels of the reference (`train.py:409-454`)."""
    plt = _mpl()
    if plt is None:
        return
    valid = np.asarray(dets.get("valid", np.ones(len(dets["boxes"]), bool)))
    img = draw_detections(
        image, np.asarray(dets["boxes"])[valid], np.asarray(dets["scores"])[valid],
        np.asarray(dets["classes"])[valid], names, keypoints=keypoints,
    )
    fig, ax = plt.subplots(figsize=(8, 8 * img.shape[0] / max(img.shape[1], 1)))
    ax.imshow(img)
    ax.axis("off")
    _finish(fig, Path(path))


def plot_matches(
    image_a: np.ndarray,
    image_b: np.ndarray,
    points_a: np.ndarray,
    points_b: np.ndarray,
    path: str | Path,
) -> None:
    """Side-by-side match visualization (reference match images,
    `descriptor_evaluation.py:118-130` / `train.py:433-454`)."""
    plt = _mpl()
    if plt is None:
        return

    def to_u8(im):
        im = np.asarray(im)
        if im.dtype != np.uint8:
            im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        if im.ndim == 2 or im.shape[-1] == 1:
            im = np.repeat(im.reshape(*im.shape[:2], 1), 3, axis=-1)
        return im

    a, b = to_u8(image_a), to_u8(image_b)
    h = max(a.shape[0], b.shape[0])
    canvas = np.zeros((h, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1]:] = b
    fig, ax = plt.subplots(figsize=(12, 6))
    ax.imshow(canvas)
    pa, pb = np.asarray(points_a), np.asarray(points_b)
    for (xa, ya), (xb, yb) in zip(pa[:, :2], pb[:, :2]):
        ax.plot([xa, xb + a.shape[1]], [ya, yb], linewidth=0.5, color="lime")
    ax.scatter(pa[:, 0], pa[:, 1], s=3, c="red")
    ax.scatter(pb[:, 0] + a.shape[1], pb[:, 1], s=3, c="red")
    ax.axis("off")
    _finish(fig, Path(path))
