"""HPatches evaluation driver: repeatability, homography correctness @ε,
matching score, match mAP.

Replaces the reference's two-stage pipeline (`export_descriptor.py:28-138`
dumping per-pair .npz, then `evaluation_hpatches.py:395-758` consuming them):
here a single pass streams pairs through the jitted inference pipeline and
aggregates the metrics (optionally still dumping the reference-schema .npz
for cross-checking). Metric definitions are identical:
  * repeatability @ top-300, 3px (`detector_evaluation.py:42-162`)
  * homography correctness with mean 4-corner error <= ε, ε in
    {1, 3, 5, 10, 20, 50} (`evaluation_hpatches.py:480`)
  * matching score 2*inliers/(N1+N2) (`evaluation_hpatches.py:510`)
  * mAP of match confidence via PR integration over the mutual-match
    distances (`evaluation_hpatches.py:573-613`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping, Optional

import numpy as np

from yolopoint_tpu.evaluation.descriptor_eval import compute_homography_correctness
from yolopoint_tpu.evaluation.detector_eval import (
    compute_repeatability,
    homography_scaling_np,
)


def _normalized_from_pixel_h(H_pix: np.ndarray, shape_hw) -> np.ndarray:
    """Pixel-space H -> the normalized [-1,1] convention used internally."""
    h, w = shape_hw
    trans = np.array([[2.0 / w, 0, -1], [0, 2.0 / h, -1], [0, 0, 1.0]])
    return trans @ H_pix @ np.linalg.inv(trans)


def match_average_precision(distances: np.ndarray, correct: np.ndarray) -> float:
    """AP of match confidence (1 - normalized distance) vs inlier labels —
    sklearn.average_precision_score equivalent, dependency-free."""
    if len(distances) == 0 or correct.sum() == 0:
        return 0.0
    conf = 1.0 - distances / max(distances.max(), 1e-9)
    order = np.argsort(-conf)
    c = correct[order].astype(np.float64)
    tp = np.cumsum(c)
    precision = tp / (np.arange(len(c)) + 1)
    recall = tp / c.sum()
    # AP = sum over recall steps of precision
    return float(np.sum(np.diff(np.concatenate([[0.0], recall])) * precision))


def evaluate_hpatches(
    pipeline,
    dataset,
    keep_k_points: int = 300,
    correctness_eps: tuple = (1, 3, 5, 10, 20, 50),
    max_pairs: Optional[int] = None,
    export_dir: Optional[str | Path] = None,
    seed: int = 0,
) -> dict[str, Any]:
    """Run the full HPatches protocol.

    Args:
      pipeline: an `InferencePipeline` (keypoints+descriptors; boxes unused).
      dataset: `yolopoint_tpu.data.datasets.HPatches`.
      export_dir: optionally dump per-pair .npz in the reference schema
        (`image, prob, desc, warped_image, warped_prob, warped_desc,
        homography`) for cross-framework comparison.

    Returns:
      dict of aggregated metrics.
    """
    np.random.seed(seed)  # reference reproducibility seeding (hpatches:411-415)
    reps, loc_errs, mscores, maps = [], [], [], []
    correct_at = {e: [] for e in correctness_eps}
    n = len(dataset) if max_pairs is None else min(max_pairs, len(dataset))

    for i in range(n):
        sample = dataset[i]
        img1, img2 = sample["image"], sample["warped_image"]
        shape_hw = img1.shape[:2]
        H_pix = sample["homography_pix"]
        # normalized-coords inverse homography (internal convention: image2
        # content at x2 = H_pix @ x1 -> inv_homography maps view1 -> view2)
        H_norm = _normalized_from_pixel_h(H_pix, shape_hw)
        inv_h = H_norm
        hom = np.linalg.inv(H_norm)

        out1 = {k: np.asarray(v) for k, v in pipeline(img1[None]).items()}
        out2 = {k: np.asarray(v) for k, v in pipeline(img2[None]).items()}
        kp1 = np.concatenate(
            [out1["keypoints"][0][out1["kp_valid"][0]],
             out1["kp_scores"][0][out1["kp_valid"][0], None]], axis=1,
        )
        kp2 = np.concatenate(
            [out2["keypoints"][0][out2["kp_valid"][0]],
             out2["kp_scores"][0][out2["kp_valid"][0], None]], axis=1,
        )
        d1 = out1["descriptors"][0][out1["kp_valid"][0]]
        d2 = out2["descriptors"][0][out2["kp_valid"][0]]

        rep, loc = compute_repeatability(
            kp1.copy(), kp2.copy(), hom, inv_h, shape_hw, keep_k_points
        )
        reps.append(rep)
        if loc >= 0:
            loc_errs.append(loc)

        hc = compute_homography_correctness(
            kp1, kp2, d1, d2, inv_h, shape_hw, keep_k_points
        )
        mscores.append(hc["matching_score"])
        if hc["mean_dist"] is not None:
            for e in correctness_eps:
                correct_at[e].append(float(hc["mean_dist"] <= e))
        else:
            for e in correctness_eps:
                correct_at[e].append(0.0)
        if len(hc["inliers"]) and len(hc["mscores"]):
            maps.append(match_average_precision(hc["mscores"], hc["inliers"] > 0))

        if export_dir is not None:
            out_path = Path(export_dir)
            out_path.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(
                out_path / f"{sample['name']}.npz",
                image=img1, warped_image=img2,
                prob=kp1, warped_prob=kp2,
                desc=d1, warped_desc=d2,
                homography=H_pix,
            )

    return {
        "repeatability": float(np.mean(reps)) if reps else 0.0,
        "localization_error": float(np.mean(loc_errs)) if loc_errs else -1.0,
        "matching_score": float(np.mean(mscores)) if mscores else 0.0,
        "match_mAP": float(np.mean(maps)) if maps else 0.0,
        **{f"correctness@{e}": float(np.mean(v)) for e, v in correct_at.items()},
        "num_pairs": n,
    }


def main(argv=None):
    """HPatches-protocol CLI (the reference's `evaluation_hpatches.py`
    two-stage export+eval collapsed into one pass; same metrics:
    repeatability@top-K, correctness@eps, matching score, match mAP).

      python -m yolopoint_tpu.evaluation.hpatches_runner \
          --data datasets/hpatches_synth --weights runs/<run>/best \
          [--size 240 320] [--alteration all|i|v] [--export DIR] [--json OUT]
    """
    import argparse
    import json

    ap = argparse.ArgumentParser(description="HPatches protocol evaluation")
    ap.add_argument("--data", required=True, help="HPatches-layout root dir")
    ap.add_argument("--weights", default=None,
                    help="torch .pth.tar or orbax run/checkpoint dir")
    ap.add_argument("--model", default="YOLOPoint")
    ap.add_argument("--version", default="n")
    ap.add_argument("--size", type=int, nargs=2, default=[256, 320],
                    help="eval resolution H W, mod-32 (reference uses 480 640)")
    ap.add_argument("--alteration", default="all", choices=["all", "i", "v"])
    ap.add_argument("--keep-k", type=int, default=300)
    ap.add_argument("--kpt-conf", type=float, default=0.015)
    ap.add_argument("--max-pairs", type=int, default=None)
    ap.add_argument("--export", default=None, help="dump per-pair .npz here")
    ap.add_argument("--json", default=None, help="write metrics JSON here")
    ap.add_argument("--f32", action="store_true",
                    help="disable the fused bf16 deploy path")
    args = ap.parse_args(argv)
    if args.size[0] % 32 or args.size[1] % 32:
        ap.error(f"--size {args.size} must be divisible by 32 (stride-32 "
                 "PANet level; the reference center-crops to mod-32, "
                 "/root/reference/src/demo.py:112-121)")

    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.data.datasets import HPatches
    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import fold_batch_norm, load_weights

    model_name, version, nc = args.model, args.version, 80
    if args.weights:
        loaded = load_weights(args.weights)
        variables = loaded["variables"]
        meta = loaded["meta"]
        model_name = meta.get("model_name", args.model)
        version = meta.get("version", args.version)
        nc = max(len(meta.get("names") or []), 1)
    else:
        variables = build_model(model_name, version, nc=nc).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.size[0], args.size[1], 3)), train=False,
        )
    if args.f32:
        model = build_model(model_name, version, nc=nc)
        dtype = jnp.float32
    else:
        variables = fold_batch_norm(variables)
        model = build_model(model_name, version, nc=nc,
                            dtype=jnp.bfloat16, fused=True)
        dtype = jnp.bfloat16
    pipeline = InferencePipeline(
        model, variables, {"detection_threshold": args.kpt_conf},
        compute_dtype=dtype,
    )
    dataset = HPatches(args.data, size_hw=tuple(args.size),
                       alteration=args.alteration)
    metrics = evaluate_hpatches(
        pipeline, dataset, keep_k_points=args.keep_k,
        max_pairs=args.max_pairs, export_dir=args.export,
    )
    line = json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in metrics.items()})
    print(line)
    if args.json:
        Path(args.json).write_text(line)
    return metrics


if __name__ == "__main__":
    main()
