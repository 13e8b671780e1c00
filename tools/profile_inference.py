"""Decompose headline-bench time: forward vs decode, plus FLOPs/MFU estimate.

Run on the real chip: `python tools/profile_inference.py [--batch 128]`.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bench import _build_pipeline

    B = args.batch
    pipe = _build_pipeline(B)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, 640, 640, 3)), jnp.float32
    )

    fwd = jax.jit(
        lambda x: pipe.model.apply(
            pipe.variables, x.astype(pipe.compute_dtype), train=False, decode=False
        )
    )

    def timeit(fn, label):
        out = fn(img)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(img)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:28s} {dt*1e3:9.2f} ms/batch  {B/dt:9.1f} img/s")
        return dt

    t_fwd = timeit(fwd, "forward only")
    t_all = timeit(pipe, "full pipeline")
    print(f"{'decode (difference)':28s} {(t_all-t_fwd)*1e3:9.2f} ms/batch")

    # FLOPs from XLA cost analysis of the forward
    try:
        ca = fwd.lower(img).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", 0.0)
        print(f"forward flops/batch: {flops/1e9:.1f} GF  ({flops/B/1e9:.2f} GF/img)")
        print(f"achieved: {flops/t_fwd/1e12:.1f} TFLOP/s in forward")
        ca2 = pipe._jitted.lower(img).compile().cost_analysis()
        if isinstance(ca2, list):
            ca2 = ca2[0]
        print(f"pipeline flops/batch: {ca2.get('flops',0)/1e9:.1f} GF, "
              f"bytes accessed: {ca2.get('bytes accessed',0)/1e9:.2f} GB")
        print(f"pipeline achieved: {ca2.get('flops',0)/t_all/1e12:.1f} TFLOP/s, "
              f"{ca2.get('bytes accessed',0)/t_all/1e9:.0f} GB/s")
    except Exception as e:
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
