"""Serving-artifact export CLI.

  python -m yolopoint_tpu.export.aot_cli --out yps.stablehlo \
      [--weights best.pth.tar] [--model YOLOPoint --version s --nc 80] \
      [--height 640 --width 640 --batch 1] [--config configs/inference.yaml]

Writes a self-contained StableHLO serving artifact (params baked in); load
with `yolopoint_tpu.export.aot.load_serving_artifact`.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Export an AOT serving artifact")
    p.add_argument("--out", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--model", default="YOLOPoint")
    p.add_argument("--version", default="s")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=640)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--f32", action="store_true", help="f32 conv stack (default bf16 fused)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.export.aot import save_serving_artifact
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import fold_batch_norm, load_weights
    from yolopoint_tpu.utils.config import get as cfg_get, load_config
    from yolopoint_tpu.utils.logging import LOGGER, enable_compile_cache

    enable_compile_cache()

    op_config = {}
    if args.config:
        cfg = load_config(args.config)
        op_config = dict(cfg_get(cfg, "model.superpoint", {}) or {})
        op_config.update(cfg_get(cfg, "model.yolo", {}) or {})

    if args.weights:
        loaded = load_weights(args.weights)
        variables = loaded["variables"]
        meta = loaded.get("meta", {})
        model_name = meta.get("model_name", args.model)
        version = meta.get("version", args.version)
        nc = len(meta.get("names", []) or []) or args.nc
    else:
        model_name, version, nc = args.model, args.version, args.nc
        m0 = build_model(model_name, version, nc=nc)
        variables = m0.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.height, args.width, 3)), train=False,
        )
        LOGGER.info("no weights given — exporting random init (smoke test)")

    if args.f32:
        model = build_model(model_name, version, nc=nc)
        dtype = jnp.float32
    else:
        variables = fold_batch_norm(variables)
        model = build_model(model_name, version, nc=nc, dtype=jnp.bfloat16, fused=True)
        dtype = jnp.bfloat16

    save_serving_artifact(
        args.out, model, variables, op_config,
        batch=args.batch, height=args.height, width=args.width,
        compute_dtype=dtype,
    )
    LOGGER.info(f"wrote serving artifact to {args.out}")


if __name__ == "__main__":
    main()
