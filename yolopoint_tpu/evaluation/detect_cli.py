"""Standalone detection-eval harness: score ANY checkpoint on a dataset.

TPU re-design of the reference's self-contained YOLO val script
(`/root/reference/src/evaluations/yolo_evaluation.py:96-290`): instead of a
torch loop with separate preprocess / forward / torchvision-NMS phases, the
whole device side — forward + multi-label class-offset box NMS at the val
operating point (conf 0.001 / IoU 0.6, `yolo_evaluation.py:103-104`) — is ONE
jitted XLA program per batch; the host only builds batches and accumulates
the mAP statistics (`process_batch` / `ap_per_class` / `ConfusionMatrix`).

Speed is reported like the reference's "Speed: pre / inference / NMS ms per
image" printout (`yolo_evaluation.py:278-281`), with inference+NMS fused
(they are one program here) and the host batch build as "pre".

Usage:
  python -m yolopoint_tpu.evaluation.detect_cli --config configs/coco.yaml \
      --weights runs/exp/best [--batch 16] [--conf 0.001] [--iou 0.6] \
      [--split val] [--data-root datasets] [--out results.json]

Accepts reference `.pth(.tar)` checkpoints or this framework's orbax run
dirs (`models.convert.load_weights`).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def make_eval_program(model, variables, conf_thres: float, iou_thres: float,
                      max_det: int, nc: int, max_nms: int = 30000):
    """One jitted program: forward (eval mode) + val-protocol box NMS."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.ops.nms import batched_box_nms

    @jax.jit
    def program(images):
        out = model.apply(variables, images, train=False, decode=True)
        det = batched_box_nms(
            out["objects"][0].astype(jnp.float32),
            conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
            multi_label=nc > 1, max_nms=max_nms,
        )
        return det

    return program


def evaluate_detection(
    program,
    loader,
    names,
    img_hw: tuple[int, int] | None = None,
    verbose: bool = True,
) -> dict:
    """Accumulate mAP@[.5:.95] + per-class AP + speed over a val loader.

    The loader yields padded `{image, boxes (cxcywh norm), box_mask}` batches
    (`data.loader.DataLoader`, shuffle=False).
    """
    import jax

    from yolopoint_tpu.evaluation.yolo_eval import (
        ConfusionMatrix,
        ap_per_class,
        fitness_yolo,
        process_batch,
    )
    from yolopoint_tpu.ops.boxes import xywhn2xyxy

    iouv = np.linspace(0.5, 0.95, 10)
    confusion = ConfusionMatrix(nc=max(len(names), 1))
    stats = []
    n_images = 0
    # with shuffle=False the loader walks arange(steps*B) % total, so any
    # wrapped duplicates sit at the TAIL of the last batch — stopping at
    # `total` scores every image exactly once (the reference val semantics),
    # including the final partial batch when steps = ceil(total/B)
    n_unique = getattr(loader, "total", None)
    pre_s = infer_s = 0.0
    t_host = time.perf_counter()
    for batch in loader:
        batch.pop("names", None)
        images = batch["image"]
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        B, H, W = images.shape[:3]
        pre_s += time.perf_counter() - t_host

        t0 = time.perf_counter()
        det = jax.tree_util.tree_map(np.asarray, program(images))
        infer_s += time.perf_counter() - t0

        for b in range(B):
            if n_unique is not None and n_images >= n_unique:
                break  # wrapped duplicate rows of the final partial batch
            bm = batch["box_mask"][b].astype(bool)
            gts = batch["boxes"][b][bm]
            labels = (
                np.concatenate(
                    [gts[:, :1], np.asarray(xywhn2xyxy(gts[:, 1:], W, H))], axis=1
                )
                if len(gts)
                else np.zeros((0, 5))
            )
            dv = det["valid"][b]
            dets = (
                np.concatenate(
                    [det["boxes"][b][dv], det["scores"][b][dv, None],
                     det["classes"][b][dv, None].astype(np.float32)], axis=1
                )
                if dv.any()
                else np.zeros((0, 6))
            )
            correct = process_batch(dets, labels, iouv)
            stats.append((correct, dets[:, 4], dets[:, 5], labels[:, 0]))
            confusion.process_batch(dets, labels)
            n_images += 1
        t_host = time.perf_counter()

    mp = mr = map50 = map_ = 0.0
    per_class = {}
    if stats:
        correct = np.concatenate([s[0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        pcls = np.concatenate([s[2] for s in stats])
        tcls = np.concatenate([s[3] for s in stats])
        if len(tcls) and len(conf):
            _, _, p, r, f1, ap, classes, _ = ap_per_class(
                correct, conf, pcls, tcls, return_curves=True
            )
            mp, mr = float(p.mean()), float(r.mean())
            map50, map_ = float(ap[:, 0].mean()), float(ap.mean())
            for i, c in enumerate(classes):
                c = int(c)
                per_class[names[c] if c < len(names) else str(c)] = {
                    "precision": float(p[i]), "recall": float(r[i]),
                    "ap50": float(ap[i, 0]), "ap": float(ap[i].mean()),
                }

    results = {
        "images": n_images,
        "precision": mp, "recall": mr, "mAP50": map50, "mAP": map_,
        "fitness_yolo": fitness_yolo(mp, mr, map50, map_),
        "per_class": per_class,
        "speed_ms_per_image": {
            "pre": round(1e3 * pre_s / max(n_images, 1), 3),
            "inference_nms": round(1e3 * infer_s / max(n_images, 1), 3),
        },
    }
    if verbose:
        print(f"{'class':>16} {'P':>8} {'R':>8} {'mAP50':>8} {'mAP':>8}")
        print(f"{'all':>16} {mp:8.4f} {mr:8.4f} {map50:8.4f} {map_:8.4f}")
        for name, row in per_class.items():
            print(f"{name:>16} {row['precision']:8.4f} {row['recall']:8.4f} "
                  f"{row['ap50']:8.4f} {row['ap']:8.4f}")
        sp = results["speed_ms_per_image"]
        print(f"Speed: {sp['pre']:.1f}ms pre-process, "
              f"{sp['inference_nms']:.1f}ms inference+NMS per image "
              f"({n_images} images)")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description="YOLOPoint-TPU detection val")
    parser.add_argument("--config", required=True, help="reference-schema YAML")
    parser.add_argument("--weights", required=True,
                        help=".pth(.tar) or orbax run/best dir")
    parser.add_argument("--split", default="val", choices=["val", "train"])
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--conf", type=float, default=0.001)
    parser.add_argument("--iou", type=float, default=0.6)
    parser.add_argument("--max-det", type=int, default=300)
    parser.add_argument("--data-root", default="datasets")
    parser.add_argument("--out", default=None, help="write results JSON here")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 conv stack (deploy precision)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from yolopoint_tpu.data.datasets import build_dataset
    from yolopoint_tpu.data.loader import DataLoader
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import load_weights
    from yolopoint_tpu.utils.config import load_config, resolve_sub_configs
    from yolopoint_tpu.utils.logging import enable_compile_cache

    enable_compile_cache()
    config = load_config(args.config)
    names = list(config.get("names", []))

    loaded = load_weights(args.weights)
    meta = loaded.get("meta", {})
    model_cfg = config.get("model", {})
    model = build_model(
        meta.get("model_name", model_cfg.get("name", "YOLOPoint")),
        meta.get("version", model_cfg.get("version", "s")),
        nc=max(len(names), 1),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    sets = [
        build_dataset(c["data"], args.split, names, args.data_root)
        for c in resolve_sub_configs(config, Path(args.config).parent)
    ]
    # ceil: include the final partial batch (evaluate_detection masks the
    # wrapped duplicate rows), so every val image scores exactly once like
    # the reference val loop
    total = sum(len(s) for s in sets)
    loader = DataLoader(
        sets, args.batch, shuffle=False,
        steps_per_epoch=max(-(-total // args.batch), 1),
    )

    program = make_eval_program(
        model, loaded["variables"], args.conf, args.iou, args.max_det,
        nc=max(len(names), 1),
    )
    results = evaluate_detection(program, loader, names)
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))
        print(f"[detect_cli] wrote {args.out}")
    return results


if __name__ == "__main__":
    main()
