"""Host input-pipeline throughput micro-bench.

Measures DataLoader images/sec (decode + resize + collate on the thread
pool) against the train-step rate the chip can absorb, answering "does the
host starve the TPU at B=32/640px?" (round-1 verdict item #6).

Usage:
  python tools/loader_bench.py                  # synthetic jpgs in /tmp
  python tools/loader_bench.py --root datasets --dataset coco
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synth_dataset(root: Path, n: int = 96, hw=(480, 640)) -> None:
    import cv2

    img_dir = root / "coco" / "images" / "train"
    lbl_dir = root / "coco" / "labels" / "train"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (*hw, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), img)
        (lbl_dir / f"{i:04d}.txt").write_text("0 0.5 0.5 0.3 0.3\n")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=None)
    parser.add_argument("--dataset", default="coco")
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--batches", type=int, default=12)
    parser.add_argument("--workers", type=int, default=None)
    parser.add_argument("--train-rate", type=float, default=None,
                        help="train-step images/sec to compare against")
    parser.add_argument("--host-warp", action="store_true",
                        help="include host-warp augmentation in the loader")
    args = parser.parse_args()

    from yolopoint_tpu.data.datasets import build_dataset
    from yolopoint_tpu.data.loader import DataLoader
    from yolopoint_tpu.data import native

    if args.root is None:
        tmp = tempfile.mkdtemp(prefix="loaderbench_")
        synth_dataset(Path(tmp))
        args.root = tmp

    config = {"dataset": args.dataset, "suffix": [".jpg", ".png"],
              "preprocessing": {"img_size": args.img_size}}
    host_cfg = None
    if args.host_warp:
        host_cfg = {
            "homographic": {"enable": True, "valid_border_margin": 3,
                             "params": {"perspective": True, "scaling": True,
                                        "rotation": True, "translation": True,
                                        "patch_ratio": 0.85}},
            "warped_pair": {"params": {"perspective": True, "scaling": True,
                                        "rotation": True, "translation": True,
                                        "patch_ratio": 0.85}},
        }
    ds = build_dataset(config, action="train", root=args.root)
    loader = DataLoader([ds], batch_size=args.batch_size,
                        num_workers=args.workers,
                        steps_per_epoch=args.batches,
                        host_augment_config=host_cfg)

    it = iter(loader)
    next(it)  # warm the pool + caches
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    rate = n / dt
    print(f"native_lib={'yes' if native.available() else 'no (cv2 fallback)'} "
          f"workers={loader.num_workers}")
    print(f"loader: {rate:.1f} images/sec at B={args.batch_size}/{args.img_size}px")
    if args.train_rate:
        verdict = "sustains" if rate >= args.train_rate else "STARVES"
        print(f"vs train-step rate {args.train_rate:.1f} img/s -> {verdict}")


if __name__ == "__main__":
    main()
