"""Pseudo-label export CLI — the reference `export_homography.py` workflow
(`/root/reference/src/export_homography.py:181-213`): walk a dataset split,
run homographic adaptation per image on device, write `{name}.npz {pts}`.

  python -m yolopoint_tpu.export.cli --config configs/coco_export.yaml \
      [--action train|val] [--output datasets/coco/points]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Export keypoint pseudo-labels")
    parser.add_argument("--config", required=True)
    parser.add_argument("--action", default="train", choices=["train", "val"])
    parser.add_argument("--output", default=None)
    parser.add_argument("--data_root", default="datasets")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    from yolopoint_tpu.data.datasets import build_dataset
    from yolopoint_tpu.export.homography_adaptation import export_pseudo_labels
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import load_torch_checkpoint
    from yolopoint_tpu.utils.config import get as cfg_get, load_config
    from yolopoint_tpu.utils.logging import LOGGER, enable_compile_cache

    enable_compile_cache()

    config = load_config(args.config)
    export_cfg = config.get("export", {})
    weights = args.weights or config.get("pretrained")
    out_dir = Path(args.output or export_cfg.get("output_dir", "points_out"))

    model_cfg = config.get("model", {})
    names = config.get("names", [])
    model = build_model(model_cfg.get("name", "YOLOPointDet"),
                        model_cfg.get("version", "s"), nc=max(len(names), 1))
    if weights:
        if Path(weights).is_dir():  # our own orbax run dir / best dir
            from yolopoint_tpu.training.checkpoint import load_run_variables

            variables = load_run_variables(weights)
        else:  # reference torch .pth.tar
            loaded = load_torch_checkpoint(str(weights))
            variables = loaded["variables"]
        LOGGER.info(f"loaded weights from {weights}")
    else:  # random weights: still runs (useful for pipeline smoke tests)
        import jax.numpy as jnp

        variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 320, 3)))
        LOGGER.info("no weights given — exporting with random init")

    # iter_export bypasses crop/mosaic — the split name only picks the dir
    ds = build_dataset(config["data"], action=args.action, names=names,
                       root=args.data_root)
    sp = cfg_get(config, "model.superpoint", {}) or {}
    paths = export_pseudo_labels(
        model, variables, ds.iter_export(), out_dir, seed=args.seed,
        num_homographies=int(export_cfg.get("num_homographies", 100)),
        conf_thresh=float(sp.get("detection_threshold", 0.015)),
        nms_radius=int(sp.get("nms", 4)),
        top_k=int(sp.get("top_k", 1000)),
        hom_params=export_cfg.get("homography") or {},
        erosion_radius=int(export_cfg.get("erosion_radius", 3)),
    )
    LOGGER.info(f"exported {len(paths)} pseudo-label files -> {out_dir}")


if __name__ == "__main__":
    main()
