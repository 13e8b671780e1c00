"""Bench the AOT StableHLO serving artifact against the live pipeline on the
real chip (VERDICT r3 #10: `export/aot.py` was only ever exercised on CPU).

Two-process protocol — the point of the artifact is serving WITHOUT model
code or checkpoint loading, so the reload must happen in a fresh process:

    python tools/bench_aot.py --export /tmp/yps640.stablehlo --batch 128
    python tools/bench_aot.py --run    /tmp/yps640.stablehlo --iters 10

`--run` prints one JSON line {"aot_img_s": ...}; compare with the live
pipeline's bench.py `value` (same model config, shapes, and decode — the
artifact is the SAME traced program serialized, so ≈ equal is the expected
result; a gap means deserialization changed compilation options).

Reference has no equivalent (deployment re-instantiates the torch model per
process, /root/reference/src/demo.py:34-49).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def do_export(path: str, batch: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _build_pipeline

    from yolopoint_tpu.export.aot import save_serving_artifact

    pipe = _build_pipeline(batch)
    save_serving_artifact(
        path, pipe.model, pipe.variables, pipe.config,
        batch=batch, height=640, width=640, compute_dtype=pipe.compute_dtype,
    )
    print(json.dumps({"exported": path, "bytes": os.path.getsize(path),
                      "batch": batch}))


def do_run(path: str, iters: int, warmup: int) -> None:
    import jax

    from yolopoint_tpu.export.aot import load_serving_artifact

    serve = load_serving_artifact(path)
    b, h, w, c = serve.input_shape
    img = np.random.default_rng(0).uniform(0, 1, (b, h, w, c)).astype(np.float32)
    out = None
    for _ in range(warmup):
        out = serve(img)
    jax.block_until_ready(out)
    # true execution barrier on the tunneled backend: fetch a value
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = serve(img)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    dt = time.perf_counter() - t0
    print(json.dumps({"aot_img_s": round(b * iters / dt, 2), "batch": b,
                      "iters": iters}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--export", default=None, metavar="PATH")
    ap.add_argument("--run", default=None, metavar="PATH")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()
    if args.export:
        do_export(args.export, args.batch)
    elif args.run:
        do_run(args.run, args.iters, args.warmup)
    else:
        ap.error("pass --export PATH or --run PATH")


if __name__ == "__main__":
    main()
