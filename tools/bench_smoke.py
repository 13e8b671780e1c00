"""Pre-commit bench smoke: compile + execute every serving program bench.py
measures, for one batch, on the real chip — ~2 minutes warm-cache.

VERDICT r3 #2: round 3 shipped a Pallas lowering break (288x896/r8 keys
kernel) because nothing forced the bench programs through the compiler before
the end-of-round commit. This script is that gate: it runs

  * the 640px YOLOPoint-S fused pipeline (bench_throughput program)
  * the 288x896 YOLOPoint-N KITTI pipeline (bench_kitti_n program)
  * the 480x640/r4 keypoint chain (HPatches protocol scale)
  * the kpt NMS + match chain (bench_kpt_nms_match program)

each for ONE batch, and asserts the outputs are finite/sane. Run it before
committing anything that touches ops/, frontend/, or models/:

    timeout 1800 python tools/bench_smoke.py

Exit code 0 = all serving programs compile and execute on this backend.

The pipelines run at bench.py's EXACT shapes (B=128 S-640, B=64 N-288x896),
so the persistent compile cache this run populates is the one bench.py hits:
warm-cache smoke is ~2 min, and a bench right after skips those compiles
entirely. Cold-cache (first run after an ops/ change) is dominated by the
two pipeline compiles (~10 min each on this 1-core host) — that compile IS
the thing being gated (r3's break was a Mosaic lowering failure).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# repo root importable regardless of invocation directory (bench.py lives there)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _check(name: str, fn) -> dict:
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"  ok: {name} ({dt:.1f}s)", flush=True)
    return {name: round(dt, 1)}


def main() -> int:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    timings: dict = {}

    def pipeline_640():
        from bench import BATCH, _build_pipeline

        pipe = _build_pipeline(BATCH)  # bench.py's exact program/shape
        img = jnp.asarray(rng.uniform(0, 1, (BATCH, 640, 640, 3)), jnp.float32)
        out = pipe(img)
        assert np.isfinite(np.asarray(out["box_scores"], np.float32)).all()
        assert np.asarray(out["kp_scores"]).max() >= 0

    def pipeline_kitti():
        from yolopoint_tpu.frontend.pipeline import InferencePipeline
        from yolopoint_tpu.models import build_model
        from yolopoint_tpu.models.convert import fold_batch_norm

        H, W = 288, 896
        model_f32 = build_model("YOLOPoint", "n", nc=3)
        variables = model_f32.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False
        )
        model = build_model("YOLOPoint", "n", nc=3, dtype=jnp.bfloat16, fused=True)
        pipe = InferencePipeline(
            model, fold_batch_norm(variables),
            {"detection_threshold": 0.12, "nms": 8, "top_k": 600,
             "conf_thresh": 0.25, "iou_thresh": 0.45, "max_det": 300},
            compute_dtype=jnp.bfloat16,
        )
        img = jnp.asarray(rng.uniform(0, 1, (64, H, W, 3)), jnp.float32)
        out = pipe(img)
        assert np.isfinite(np.asarray(out["box_scores"], np.float32)).all()

    def keypoints_hpatches_scale():
        from yolopoint_tpu.ops.keypoints import extract_keypoints

        hm = jnp.asarray(rng.uniform(0, 0.3, (2, 480, 640)), jnp.float32)
        pts, sc, va = jax.jit(
            lambda h: extract_keypoints(h, 0.015, 4, 1000, 4)
        )(hm)
        assert bool(np.asarray(va).any())

    def kpt_match_chain():
        from yolopoint_tpu.ops.keypoints import extract_keypoints
        from yolopoint_tpu.ops.matching import mutual_nearest_neighbor
        from yolopoint_tpu.ops.sampling import sample_descriptors

        H = W = 640

        @jax.jit
        def chain(heat_a, heat_b, desc_a, desc_b):
            pts_a, _, va = extract_keypoints(heat_a, 0.015, 4, 1000, 4)
            pts_b, _, vb = extract_keypoints(heat_b, 0.015, 4, 1000, 4)
            da = sample_descriptors(desc_a, pts_a)
            db = sample_descriptors(desc_b, pts_b)
            m = mutual_nearest_neighbor(da[0], db[0], va[0], vb[0], nn_thresh=0.7)
            return m["indices"], m["valid"]

        heat = jnp.asarray(rng.uniform(0, 0.2, (1, H, W)), jnp.float32)
        desc = jnp.asarray(rng.normal(size=(1, H // 8, W // 8, 256)), jnp.float32)
        idx, valid = chain(heat, heat, desc, desc)
        assert bool(np.asarray(valid).any())

    # cheap programs first: partial progress stays visible if a pipeline
    # compile blows the caller's timeout
    t_all = time.perf_counter()
    for name, fn in [
        ("extract_keypoints_480x640", keypoints_hpatches_scale),
        ("kpt_match_chain_640", kpt_match_chain),
        ("pipeline_n_288x896", pipeline_kitti),
        ("pipeline_s_640", pipeline_640),
    ]:
        timings.update(_check(name, fn))
    timings["total_s"] = round(time.perf_counter() - t_all, 1)
    print(json.dumps({"bench_smoke": "ok", **timings}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
