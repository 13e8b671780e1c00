"""Offline analysis of a /tmp/nan_dump.pkl produced by tools/nan_hunt.py.

Reconstructs the exact loss computation (same model/config wiring as
TrainAgent) from the dumped clean (params, batch_stats, batch, key) and
localizes the first non-finite value: per-view forward intermediates
(flax capture_intermediates), per-term losses, per-term gradient norms,
and augmented-view statistics (degenerate boxes, warp extremes).

Run on CPU while the chip trains:  JAX_PLATFORMS=cpu python tools/nan_analyze.py \
    --dump /tmp/nan_dump.pkl --config /tmp/nanhunt_runs/nanhunt/config.yml
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def tree_stats(tree, name):
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.all(np.isfinite(arr)):
            bad.append((jax.tree_util.keystr(path), arr.shape,
                        int((~np.isfinite(arr)).sum())))
    print(f"[{name}] non-finite leaves: {len(bad)}")
    for p, s, n in bad[:10]:
        print(f"    {p} shape={s} bad={n}")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default="/tmp/nan_dump.pkl")
    ap.add_argument("--config", required=True, help="run config.yml snapshot")
    ap.add_argument("--record", type=int, default=-1,
                    help="ring index to analyze (default: last = offending step)")
    args = ap.parse_args()

    from yolopoint_tpu.data.augmentation import build_training_views
    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models.detect import Detect
    from yolopoint_tpu.models.yolopoint import build_model
    from yolopoint_tpu.training.step import (
        LossWeights, losses_from_outputs, rescale_yolo_gains,
    )
    from yolopoint_tpu.utils.config import get as cfg_get, load_config

    with open(args.dump, "rb") as f:
        ring = pickle.load(f)
    rec = ring[args.record]
    print(f"analyzing e{rec['epoch']} s{rec['step']} "
          f"params_finite={rec['params_finite']}")

    config = load_config(args.config)
    names = config.get("names", [])
    nc = len(names)
    model_cfg = config.get("model", {})
    dtype_name = str(model_cfg.get("dtype", "float32")).lower()
    model = build_model(
        model_cfg.get("name", "YOLOPoint"), model_cfg.get("version", "n"),
        nc=nc,
        dtype=jnp.bfloat16 if dtype_name in ("bf16", "bfloat16") else jnp.float32,
    )
    sp = cfg_get(config, "model.superpoint", {}) or {}
    yolo = cfg_get(config, "model.yolo", {}) or {}
    img_size = int(cfg_get(config, "data.preprocessing.img_size", 640))
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(
        box=float(yolo.get("box", 0.05)), obj=float(yolo.get("obj", 1.0)),
        cls=float(yolo.get("cls", 0.5)),
        anchor_t=float(yolo.get("anchor_t", 4.0)),
    ), nc, img_size)
    sparse_cfg = sp.get("sparse_loss", {}) or {}
    sparse = sparse_cfg.get("params", sparse_cfg)
    weights = LossWeights(
        lambda_desc=float(cfg_get(config, "model.lambda_loss", 0.1)),
        lambda_obj=float(cfg_get(config, "model.lambda_loss_obj", 10.0)),
        joint_training=bool(config.get("joint_training", True)),
        desc_loss_type=str(sp.get("desc_loss",
                                  sparse_cfg.get("name", "infonce"))).lower(),
        num_samples_per_image=int(sparse.get("num_samples_per_image", 1000)),
        num_masked_non_matches_per_match=int(
            sparse.get("num_masked_non_matches_per_match", 120)),
    )
    anchors_ps = (Detect(nc=nc, anchors=model.anchors).anchors_per_stride()
                  if getattr(model, "anchors", None) is not None else None)
    aug_config = cfg_get(config, "data.augmentation", {}) or {}

    params = rec["state"]["params"]
    stats = rec["state"]["batch_stats"]
    batch = rec["batch"]
    tree_stats(params, "params")
    tree_stats(stats, "batch_stats")
    tree_stats(batch, "batch")

    # mirror the step: per-replica fold (single replica -> index 0)
    rng = jax.random.fold_in(jnp.asarray(rec["key"]), 0)
    k_aug, k_desc = jax.random.split(rng)

    base, warped = build_training_views(
        k_aug, jnp.asarray(batch["image"]), jnp.asarray(batch["points"]),
        jnp.asarray(batch["point_mask"]), jnp.asarray(batch["boxes"]),
        jnp.asarray(batch["box_mask"]), aug_config,
    )
    for nm, view in (("base", base), ("warped", warped)):
        tree_stats(view, f"view:{nm}")
        b = np.asarray(view.boxes)
        m = np.asarray(view.box_mask).astype(bool)
        if b.shape[-1] == 5 and m.any():
            wh = b[..., 3:5][m]
            print(f"  {nm}: boxes valid={m.sum()} wh_min={wh.min():.3e} "
                  f"wh_max={wh.max():.3e}")
        img = np.asarray(view.image)
        print(f"  {nm}: image[{img.min():.3f},{img.max():.3f}] "
              f"valid_frac={np.asarray(view.valid_mask).mean():.3f}")

    variables = {"params": params, "batch_stats": stats}
    out, inter = model.apply(
        variables, base.image, train=True,
        mutable=["batch_stats", "intermediates"],
        capture_intermediates=True,
    )
    out_w, inter_w = model.apply(
        variables, warped.image, train=True,
        mutable=["batch_stats", "intermediates"],
        capture_intermediates=True,
    )
    for nm, o, iv in (("base", out, inter), ("warped", out_w, inter_w)):
        if tree_stats(o, f"forward:{nm}"):
            # walk intermediates in insertion order to find the FIRST bad one
            flat = jax.tree_util.tree_flatten_with_path(
                iv["intermediates"])[0]
            for path, leaf in flat:
                arr = np.asarray(leaf)
                if not np.all(np.isfinite(arr)):
                    print(f"  first bad intermediate: "
                          f"{jax.tree_util.keystr(path)} shape={arr.shape}")
                    break
        semi = np.asarray(o["semi"], np.float32)
        desc = np.asarray(o["desc"], np.float32)
        print(f"  {nm}: |semi|max={np.abs(semi).max():.3e} "
              f"|desc|max={np.abs(desc).max():.3e}")

    # per-term losses and gradient norms
    def term_fn(term):
        def f(p):
            o1, v1 = model.apply({"params": p, "batch_stats": stats},
                                 base.image, train=True, mutable=["batch_stats"])
            o2, _ = model.apply(
                {"params": p, "batch_stats": v1["batch_stats"]},
                warped.image, train=True, mutable=["batch_stats"])
            total, aux = losses_from_outputs(
                o1, o2, base, warped, k_desc, obj_cfg, weights, anchors_ps, nc)
            return aux[term]
        return f

    _, aux0 = losses_from_outputs(
        out, out_w, base, warped, k_desc, obj_cfg, weights, anchors_ps, nc)
    for term in aux0:
        val = float(aux0[term])
        g = jax.grad(term_fn(term))(params)
        gn = float(jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                                for x in jax.tree_util.tree_leaves(g))))
        print(f"term {term}: value={val:.6e} grad_norm={gn:.6e} "
              f"{'<-- NON-FINITE' if not (np.isfinite(val) and np.isfinite(gn)) else ''}")


if __name__ == "__main__":
    main()
