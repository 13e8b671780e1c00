"""Headline benchmark: YOLOPoint-S 640px inference (boxes + keypoints +
descriptors, full device-resident decode) on one chip.

The model runs the way it would be deployed: conv+BN folded at parameter
level (`fold_batch_norm` — the reference fuses at load,
`/root/reference/src/demo.py:49`) and the conv stack in bfloat16 on the MXU.
Reported numbers:
  * value          — batched images/sec/chip (headline, batch=BATCH)
  * batch1_ms_p50  — single-frame latency, median
  * kpt_match_ms_p50 — keypoint NMS + top-k + mutual-NN match p50 latency
    (BASELINE.md secondary north-star metric)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline: the torch-CPU reference path for the same model/size measured on
this machine (see TORCH_CPU_BASELINE_IMG_S; re-measure with
`python bench.py --measure-torch`). Driver target (BASELINE.md): >=5x
torch-CPU and >=A100-parity images/sec/chip on v5e.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# torch-CPU images/sec for YOLOPoint-S 640px inference measured on this host
# with the reference-equivalent pipeline (see --measure-torch); single core.
TORCH_CPU_BASELINE_IMG_S = 0.48

BATCH = 128


def _build_pipeline(batch: int, H: int = 640, W: int = 640):
    """Fused bf16 inference pipeline with BN folded into conv weights."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import fold_batch_norm

    model_f32 = build_model("YOLOPoint", "s", nc=80)
    variables = model_f32.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    folded = fold_batch_norm(variables)
    model = build_model("YOLOPoint", "s", nc=80, dtype=jnp.bfloat16, fused=True)
    return InferencePipeline(
        model, folded,
        {"detection_threshold": 0.015, "nms": 4, "top_k": 1000,
         "conf_thresh": 0.25, "iou_thresh": 0.45, "max_det": 300},
        compute_dtype=jnp.bfloat16,
    )


def bench_throughput(batch: int = BATCH, iters: int = 12, warmup: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    pipe = _build_pipeline(batch)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, 640, 640, 3)), jnp.float32
    )
    for _ in range(warmup):
        out = pipe(img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(img)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _median_program_ms(fn, args, chunks: int = 6, per_chunk: int = 10) -> float:
    """Median per-program device time: dispatch `per_chunk` dependent-free
    calls back-to-back and sync once per chunk. (Per-call sync would measure
    the dev-tunnel round trip — ~30 ms here — instead of the program.)"""
    import jax

    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        out = None
        for _ in range(per_chunk):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / per_chunk)
    return float(np.median(times) * 1e3)


def bench_batch1_latency() -> float:
    """Median single-frame program latency in ms (forward + full decode)."""
    import jax.numpy as jnp

    pipe = _build_pipeline(1)
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 640, 640, 3)), jnp.float32)
    return _median_program_ms(pipe, (img,))


def bench_kpt_nms_match() -> float:
    """p50 latency of the keypoint post-processing chain on device: heatmap
    NMS + top-k extraction for two frames + descriptor sampling + mutual-NN
    matching (the `kpt NMS + match` secondary metric, BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.ops.keypoints import extract_keypoints
    from yolopoint_tpu.ops.matching import mutual_nearest_neighbor
    from yolopoint_tpu.ops.sampling import sample_descriptors

    H = W = 640
    D = 256

    @jax.jit
    def chain(heat_a, heat_b, desc_a, desc_b):
        pts_a, sc_a, va = extract_keypoints(heat_a, 0.015, 4, 1000, 4)
        pts_b, sc_b, vb = extract_keypoints(heat_b, 0.015, 4, 1000, 4)
        da = sample_descriptors(desc_a, pts_a)
        db = sample_descriptors(desc_b, pts_b)
        m = mutual_nearest_neighbor(da[0], db[0], va[0], vb[0], nn_thresh=0.7)
        return pts_a, pts_b, m["indices"], m["valid"]

    rng = np.random.default_rng(2)
    heat_a = jnp.asarray(rng.uniform(0, 0.2, (1, H, W)), jnp.float32)
    heat_b = jnp.asarray(rng.uniform(0, 0.2, (1, H, W)), jnp.float32)
    desc_a = jnp.asarray(rng.normal(size=(1, H // 8, W // 8, D)), jnp.float32)
    desc_b = jnp.asarray(rng.normal(size=(1, H // 8, W // 8, D)), jnp.float32)
    return _median_program_ms(chain, (heat_a, heat_b, desc_a, desc_b))


def measure_torch_cpu(iters: int = 3) -> float:
    """Measure the torch reference YOLOPoint-S 640px forward + numpy decode
    (the reference demo path) on CPU for the vs_baseline anchor."""
    sys.path.insert(0, "tests")
    from reference_oracle import import_reference_model_module

    import torch

    ref_models = import_reference_model_module()
    torch.manual_seed(0)
    m = ref_models.Model(names=[f"c{i}" for i in range(80)], model_name="YOLOPoint", version="s")
    m.eval()
    x = torch.rand(1, 3, 640, 640)
    with torch.no_grad():
        m(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            out = m(x)
            # decode cost is dominated by the conv stack on CPU; include the
            # semi softmax+reshape to mirror the demo path
            semi = out["semi"]
            torch.nn.functional.softmax(semi, dim=1)
        dt = time.perf_counter() - t0
    return iters / dt


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: re-runs skip the ~1 min/pipeline
    compiles."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


if __name__ == "__main__":
    if "--measure-torch" in sys.argv:
        ips = measure_torch_cpu()
        print(f"torch-cpu: {ips:.3f} img/s")
        sys.exit(0)
    _enable_compile_cache()
    # order matters: the big-model programs leave device/allocator state that
    # inflates later small-program timings, so measure the post-processing
    # chain first, the batch-1 pipeline second, bulk throughput last (the
    # pipelined B=32 loop is insensitive to it)
    kpt_ms = bench_kpt_nms_match()
    batch1_ms = bench_batch1_latency()
    value = bench_throughput()
    print(json.dumps({
        "metric": "yolopoint_s_640_inference",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / TORCH_CPU_BASELINE_IMG_S, 2),
        "batch": BATCH,
        "batch1_ms_p50": round(batch1_ms, 3),
        "kpt_match_ms_p50": round(kpt_ms, 3),
        "precision": "bf16-fused",
    }))
