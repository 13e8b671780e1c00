"""Training CLI mirroring the reference's `src/train.py` argparse surface.

Reference launch (`/root/reference/src/train.py:622-654`, `README.md:76`):
  accelerate launch src/train.py --config configs/coco.yaml --exper_name run1
Here (single-controller JAX — multi-host via jax.distributed, no launcher):
  python -m yolopoint_tpu.training.cli --config configs/coco.yaml \
      --exper_name run1 [--model YOLOPoint --version s] [--debug] [--resume]

Reads the reference YAML schema (same configs work), snapshots the merged
config into the run dir like the reference (`:644-645`).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_agent(argv=None):
    """Parse train-CLI args and construct the fully-wired TrainAgent
    (loaders, device-resident feed, run dir) without starting the epoch
    loop — tools (NaN hunts, profilers) reuse the exact CLI setup so rng
    state and data order replay bit-for-bit."""
    parser = argparse.ArgumentParser(description="Train YOLOPoint-TPU")
    parser.add_argument("--config", required=True)
    parser.add_argument("--exper_name", default="exp")
    parser.add_argument("--model", default=None)
    parser.add_argument("--version", default=None)
    parser.add_argument("--output_dir", default="logs")
    parser.add_argument("--data_root", default="datasets")
    parser.add_argument("--debug", action="store_true",
                        help="truncate datasets + force val split (overfit test)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--pretrained", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from yolopoint_tpu.data.datasets import build_dataset
    from yolopoint_tpu.data.loader import DataLoader
    from yolopoint_tpu.training.agent import TrainAgent
    from yolopoint_tpu.utils.config import load_config, resolve_sub_configs, save_config
    from yolopoint_tpu.utils.logging import LOGGER, enable_compile_cache

    enable_compile_cache()

    overrides = {}
    if args.model or args.version:
        overrides["model"] = {}
        if args.model:
            overrides["model"]["name"] = args.model
        if args.version:
            overrides["model"]["version"] = args.version
    if args.resume:
        overrides["resume"] = True
    if args.pretrained:
        overrides["pretrained"] = args.pretrained

    config = load_config(args.config, overrides)
    names = config.get("names", [])

    sub_cfgs = resolve_sub_configs(config, Path(args.config).parent)
    tp = config.get("training_params", {})
    train_sets = [
        build_dataset(c["data"], "train", names, args.data_root, args.debug)
        for c in sub_cfgs
    ]
    val_sets = [
        build_dataset(c["data"], "val", names, args.data_root, args.debug)
        for c in sub_cfgs
    ]
    aug_cfg = (config.get("data") or {}).get("augmentation") or {}
    # host_warp -> base/pair views are warped by CPU workers with the native
    # C++ kernel; the device step skips per-pixel warp gathers (see
    # data.host_augment). DEFAULT requires BOTH the native library (the
    # pure-numpy fallback warp is far too slow to feed a chip) and enough
    # host cores to hide the warp behind the device step — on a 1-core host
    # the warp serializes with dispatch and loses badly to device-side
    # augmentation (measured: 13.5 s/step host vs ~0.4 s device at B=32).
    # Set host_warp explicitly to override either way.
    import os

    from yolopoint_tpu.data.native import warp_backend

    host_warp = bool(aug_cfg.get(
        "host_warp", warp_backend() == "native" and (os.cpu_count() or 1) >= 4))
    host_cfg = aug_cfg if host_warp else None
    LOGGER.info(
        f"augmentation warp path: "
        f"{'host (' + warp_backend() + ')' if host_warp else 'device (jitted step)'}"
    )
    train_loader = DataLoader(
        train_sets, int(tp.get("train_batch_size", 8)), shuffle=True,
        seed=args.seed, host_augment_config=host_cfg,
    )
    # device-resident training data (data.device_resident: true|false|auto):
    # when the whole set fits in HBM and the feed path is plain (no
    # host-warp, no mosaic), push it to the device once and gather batches
    # by index inside jit — per-step host->device traffic drops from the
    # image batch (tens of MB over the tunnel) to a (B,) index vector.
    dev_res = (config.get("data") or {}).get("device_resident", "auto")
    if dev_res is True or dev_res == "auto":
        from yolopoint_tpu.data.device_data import (
            DeviceDataLoader, dataset_nbytes,
        )
        from yolopoint_tpu.parallel.mesh import make_mesh

        feed_plain = host_cfg is None and not train_loader.mosaic_prob
        try:
            fits = dataset_nbytes(train_sets, train_loader.max_points,
                                  train_loader.max_boxes) < 6e9
        except Exception:
            fits = False
        if (feed_plain and fits) if dev_res == "auto" else True:
            train_loader = DeviceDataLoader(
                train_loader, make_mesh(),
                cache_dir=str(Path(args.data_root) / "_device_cache"))
        else:
            LOGGER.info(
                f"device_resident=auto: keeping host loader "
                f"(plain_feed={feed_plain}, fits_hbm={fits})")
    val_aug = (config.get("data") or {}).get("val_augmentation") or aug_cfg
    val_host_cfg = val_aug if host_warp else None
    val_loader = DataLoader(
        val_sets, int(tp.get("val_batch_size", 8)), shuffle=False,
        seed=args.seed, host_augment_config=val_host_cfg,
    )

    output_dir = Path(args.output_dir) / args.exper_name
    output_dir.mkdir(parents=True, exist_ok=True)
    save_config(config, output_dir / "config.yml")
    LOGGER.info(f"training {config.get('model', {}).get('name')} -> {output_dir}")

    return TrainAgent(config, output_dir, train_loader, val_loader, seed=args.seed)


def main(argv=None):
    agent = build_agent(argv)
    # interrupt-safe: agent.train() saves a `last` checkpoint on
    # KeyboardInterrupt (reference train.py:299-305)
    agent.train()


if __name__ == "__main__":
    main()
