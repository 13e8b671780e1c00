"""Diagnose the trained detector: does the heatmap peak at real corners?

Loads a run's latest weights, forwards ONE clean (unaugmented) synthetic val
image on CPU, and reports:
  * cell-level: at corner-labeled cells, how often argmax over 65 channels is
    (a) not dustbin, (b) the exact true subcell channel
  * pixel-level: distances from top-N extracted keypoints to the nearest
    ground-truth corner
This separates "model never learned corners" from "decode/val-path bug".

  JAX_PLATFORMS=cpu python tools/diag_detector.py runs/synth_r3
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolopoint_tpu.data.synthetic import SyntheticShapes
from yolopoint_tpu.models.yolopoint import build_model
from yolopoint_tpu.ops.heatmap import cells_to_heatmap, labels_to_cells
from yolopoint_tpu.ops.keypoints import extract_keypoints
from yolopoint_tpu.training.checkpoint import load_run_variables


def main(run_dir: str, idx: int = 3):
    meta = None
    import json, glob
    metas = sorted(glob.glob(os.path.join(run_dir, "meta_*.json")),
                   key=lambda p: int(p.split("_")[-1].split(".")[0]))
    with open(metas[-1]) as f:
        meta = json.load(f)
    cfg = meta["config"]
    variables = load_run_variables(run_dir, prefer_ema=False)
    model = build_model(cfg["model"]["name"], cfg["model"]["version"],
                        nc=len(cfg["names"]), dtype=jnp.float32)

    ds = SyntheticShapes(cfg["data"], action="val", names=cfg["names"])
    s = ds.get(idx)
    img = s["image"].astype(np.float32) / 255.0
    pts = s["points"]  # (N,2) xy
    H, W = img.shape[:2]
    print(f"image {s['name']}: {H}x{W}, {len(pts)} gt corners")

    out = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      img[None], train=False)
    semi = np.asarray(out["semi"].astype(jnp.float32))[0]  # (Hc, Wc, 65)
    prob = jax.nn.softmax(semi, axis=-1)
    heat = np.asarray(cells_to_heatmap(np.asarray(prob)[None][..., :]))[0]

    # build ground-truth cells
    lab = np.zeros((H, W), np.float32)
    pi = np.round(pts).astype(int)
    pi = pi[(pi[:, 0] >= 0) & (pi[:, 0] < W) & (pi[:, 1] >= 0) & (pi[:, 1] < H)]
    lab[pi[:, 1], pi[:, 0]] = 1.0
    cells = np.asarray(labels_to_cells(jnp.asarray(lab[None])))[0]  # (Hc,Wc,65)
    true_ch = cells.argmax(-1)
    corner_cells = true_ch != 64

    pred_ch = np.asarray(prob).argmax(-1)
    n_corner = corner_cells.sum()
    not_dustbin = (pred_ch[corner_cells] != 64).mean() if n_corner else float("nan")
    exact = (pred_ch[corner_cells] == true_ch[corner_cells]).mean() if n_corner else float("nan")
    print(f"corner cells: {n_corner}; pred!=dustbin at corner cells: {not_dustbin:.3f}; "
          f"exact subcell: {exact:.3f}")
    print(f"dustbin prob at corner cells: {np.asarray(prob)[..., 64][corner_cells].mean():.3f} "
          f"vs non-corner cells: {np.asarray(prob)[..., 64][~corner_cells].mean():.3f}")
    # how many non-corner cells predict non-dustbin (false positives)
    fp = (pred_ch[~corner_cells] != 64).mean()
    print(f"non-corner cells predicting a point: {fp:.4f}")

    kpts, scores, valid = extract_keypoints(jnp.asarray(heat)[None], 0.015, 4, 300)
    kpts = np.asarray(kpts)[0][np.asarray(valid)[0].astype(bool)]
    scores_v = np.asarray(scores)[0][np.asarray(valid)[0].astype(bool)]
    print(f"extracted {len(kpts)} keypoints, score range "
          f"[{scores_v.min() if len(kpts) else 0:.4f}, {scores_v.max() if len(kpts) else 0:.4f}]")
    if len(kpts) and len(pi):
        d = np.linalg.norm(kpts[:, None, :] - pi[None, :, :].astype(np.float32), axis=-1)
        dmin = d.min(1)
        for n in (25, 100, len(kpts)):
            n = min(n, len(kpts))
            print(f"top-{n} kpts: median dist to nearest gt {np.median(dmin[:n]):.2f}px, "
                  f"<=3px: {(dmin[:n] <= 3).mean():.3f}")
        # recall: gt corners with a predicted point within 3px
        rec = (d.min(0) <= 3).mean()
        print(f"gt corners recalled within 3px: {rec:.3f}")
    print(f"heatmap stats: max {heat.max():.4f} mean {heat.mean():.6f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/synth_r3",
         int(sys.argv[2]) if len(sys.argv) > 2 else 3)
