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
        # serving fast path: bf16 heatmap (halves the d2s relayout + kpt-NMS
        # HBM traffic; metric-identical on the trained S@640 checkpoint) and
        # max_nms 512 (n_candidates telemetry reports if the cap ever binds
        # at conf 0.25)
        {"detection_threshold": 0.015, "nms": 4, "top_k": 1000,
         "conf_thresh": 0.25, "iou_thresh": 0.45, "max_det": 300,
         "heatmap_dtype": "bf16", "max_nms": 512},
        compute_dtype=jnp.bfloat16,
    )


# TPU v5e (v5 lite) peak dense matmul throughput, bf16
PEAK_TFLOPS_BF16 = 197.0


def _trained_metrics() -> dict:
    """Trained-model evidence hook (VERDICT r1 #1): surface the best
    extended-val metrics of completed training runs (written by
    tools/summarize_run.py into RESULTS.json) in the bench line, so
    BENCH_r*.json carries repeatability / homography-correctness /
    matching-score / mAP from TRAINED weights, not just random-weight
    throughput.

    VERDICT r4 #2: the full RESULTS.json blob is ~8 KB and, placed at the
    end of the line, consumed the driver's 2000-char tail capture so the
    official record carried zero perf numbers. Compact each run to <=4
    headline keys here; the full per-run record stays in RESULTS.json."""
    import os

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.json")
    if not os.path.exists(p):
        return {}
    try:
        with open(p) as f:
            full = json.load(f)
    except Exception:
        return {}
    compact = {}
    for run, rec in full.items():
        if not isinstance(rec, dict):
            continue
        best = rec.get("best", {}) if isinstance(rec.get("best"), dict) else {}
        row = {}
        for k in ("fitness", "repeatability", "matching_score", "mAP50"):
            if k in best:
                row[k] = best[k]
        hp = rec.get("hpatches")
        if isinstance(hp, dict) and "correctness@3" in hp:
            row["hpatches_corr3"] = hp["correctness@3"]
        if row:
            compact[run] = row
    return {"trained": compact} if compact else {}


def _program_flops(jitted, *args) -> float:
    """FLOPs of one execution of a jitted program, from XLA's compiled cost
    analysis (falls back to 0.0 if the backend doesn't report it)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_throughput(batch: int = BATCH, iters: int = 12, warmup: int = 3):
    """Returns (img_s, stats): headline throughput plus the quantitative
    breakdown — program FLOPs -> MFU, and forward-vs-decode time split."""
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
    img_s = batch * iters / dt

    # ---- quantitative accounting ----
    flops = _program_flops(pipe._jitted, img)
    mfu = flops / batch * img_s / (PEAK_TFLOPS_BF16 * 1e12) if flops else 0.0

    # forward-only program (conv stack, no decode) for the time split
    fwd = jax.jit(
        lambda x: pipe.model.apply(
            pipe.variables, x.astype(pipe.compute_dtype), train=False, decode=False
        )
    )
    total_ms = _median_program_ms(pipe, (img,), chunks=4, per_chunk=5)
    fwd_ms = _median_program_ms(fwd, (img,), chunks=4, per_chunk=5)
    stats = {
        "mfu": round(mfu, 4),
        "gflops_per_image": round(flops / batch / 1e9, 2) if flops else None,
        "forward_ms": round(fwd_ms, 2),
        "decode_ms": round(max(total_ms - fwd_ms, 0.0), 2),
        "peak_tflops_bf16": PEAK_TFLOPS_BF16,
    }
    return img_s, stats


def bench_kitti_n(batch: int = 64, iters: int = 10, warmup: int = 3) -> float:
    """BASELINE.json config #2: YOLOPoint-N batched KITTI-shape inference
    (288x896 crop frame, `/root/reference/configs/kitti.yaml:9,64`) with the
    fused keypoint-NMS + box-NMS decode on device."""
    import jax
    import jax.numpy as jnp

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
        # reference kitti_inference.yaml operating point + serving fast path
        {"detection_threshold": 0.12, "nms": 8, "top_k": 600,
         "conf_thresh": 0.25, "iou_thresh": 0.45, "max_det": 300,
         "heatmap_dtype": "bf16", "max_nms": 512},
        compute_dtype=jnp.bfloat16,
    )
    img = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (batch, H, W, 3)), jnp.float32
    )
    for _ in range(warmup):
        out = pipe(img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(img)
    jax.block_until_ready(out)
    return batch * iters / (time.perf_counter() - t0)


def bench_train_step(batch: int = 16, iters: int = 8, warmup: int = 2,
                     host_warp: bool = True):
    """Training-step throughput: full jitted joint train step (detector +
    descriptor + object losses, grads, optimizer, EMA) for YOLOPoint-S
    640px, device-resident batch. Returns (img_s, train_mfu, host_warp_ms).

    `host_warp=True` measures the DEFAULT training data path
    (`data.augmentation.host_warp`): base/pair homographic warps run on
    loader workers (native C++ `native/preprocess.cc`), the jitted step
    consumes the precomputed u8 views. The timed loop is the device-bound
    rate — in training the host warps overlap device compute on the loader
    workers; their standalone cost is returned as `host_warp_ms` per batch.
    `host_warp=False` times the fully-on-device-aug single program (warp
    gathers lower poorly on TPU — kept as the non-default diagnostic)."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights, make_train_step, rescale_yolo_gains,
    )

    H = W = 640
    mesh = make_mesh()
    model = build_model("YOLOPoint", "s", nc=80, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, H, W, 3),
        tx=make_optimizer(learning_rate=1e-3), ema=True,
    )
    aug = {
        "photometric": {"enable": False},
        "homographic": {"enable": True, "params": {"patch_ratio": 0.85},
                        "valid_border_margin": 3},
        "warped_pair": {"params": {"patch_ratio": 0.85}},
    }
    obj = rescale_yolo_gains(ObjectLossConfig(), nc=80, img_size=H)
    weights = LossWeights(num_samples_per_image=600,
                          num_masked_non_matches_per_match=100)
    step = make_train_step(model, mesh, aug, obj, weights, 80,
                           donate=False, ema_decay=0.9999, ema_tau=2000.0)
    rng = np.random.default_rng(4)
    batch_np = {
        "image": rng.uniform(0, 1, (batch, H, W, 3)).astype(np.float32),
        "points": rng.uniform(8, H - 8, (batch, 200, 2)).astype(np.float32),
        "point_mask": np.ones((batch, 200), bool),
        "boxes": np.concatenate(
            [rng.uniform(100, 500, (batch, 30, 4)),
             rng.integers(0, 80, (batch, 30, 1)).astype(np.float32)], axis=-1
        ).astype(np.float32),
        "box_mask": np.ones((batch, 30), bool),
    }
    host_warp_ms = 0.0
    if host_warp:
        from yolopoint_tpu.data.host_augment import host_warp_views

        hw_rng = np.random.default_rng(7)
        batch_np = host_warp_views(batch_np, aug, hw_rng)
        t0 = time.perf_counter()
        host_warp_views({k: v for k, v in batch_np.items()
                         if not k.startswith("precomputed_")}, aug, hw_rng)
        host_warp_ms = (time.perf_counter() - t0) * 1e3
    sb = shard_batch(batch_np, mesh)
    key = jax.random.PRNGKey(5)
    # sync with device_get, NOT block_until_ready: on the tunneled backend
    # block_until_ready can return before the train step actually executed
    # (measured: an 8-step loop "finished" in 29 ms while real steps are
    # ~100 ms), which silently turns the timing into dispatch-only. Fetching
    # the loss value is a true execution barrier (and catches NaNs).
    for _ in range(max(warmup, 3)):
        state, aux = step(state, sb, key)
        float(jax.device_get(aux["loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, sb, key)
    float(jax.device_get(aux["loss"]))  # chained through state: syncs all
    img_s = batch * iters / (time.perf_counter() - t0)
    flops = 0.0
    try:
        flops = _program_flops(step, state, sb, key)
    except Exception:
        pass
    mfu = flops / batch * img_s / (PEAK_TFLOPS_BF16 * 1e12) if flops else 0.0
    return img_s, round(mfu, 4), round(host_warp_ms, 1)


def bench_trained_serving(batch: int = 128, iters: int = 10, warmup: int = 3):
    """Serving throughput with the TRAINED flagship checkpoint (VERDICT r4
    #1: the headline uses random weights so score distributions are
    synthetic; decode is fixed-shape so the numbers should agree — this
    measurement proves it with real trained score statistics).

    Returns (img_s, run_name) or (None, None) when no S@640 checkpoint is
    committed."""
    import os

    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.models.convert import fold_batch_norm, load_weights

    root = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        ("synth_s640_pseudo2", "artifacts/synth_s640_pseudo2/best"),
        ("synth_s640_pseudo2", "runs/synth_s640_pseudo2/best"),
        ("synth_s640_pseudo", "artifacts/synth_s640_pseudo/best"),
        ("synth_s640_pseudo", "runs/synth_s640_pseudo/best"),
        ("synth_s640", "artifacts/synth_s640/best"),
        ("synth_s640", "runs/synth_s640/best"),
    ]
    found = next(((n, os.path.join(root, p)) for n, p in candidates
                  if os.path.isdir(os.path.join(root, p))), None)
    if found is None:
        return None, None
    run_name, path = found
    loaded = load_weights(path)
    meta = loaded["meta"]
    version = meta.get("version", "s")
    nc = max(len(meta.get("names") or []), 1)
    model = build_model(meta.get("model_name", "YOLOPoint"), version, nc=nc,
                        dtype=jnp.bfloat16, fused=True)
    pipe = InferencePipeline(
        model, fold_batch_norm(loaded["variables"]),
        {"detection_threshold": 0.015, "nms": 4, "top_k": 1000,
         "conf_thresh": 0.25, "iou_thresh": 0.45, "max_det": 300,
         "heatmap_dtype": "bf16", "max_nms": 512},
        compute_dtype=jnp.bfloat16,
    )
    img = jnp.asarray(
        np.random.default_rng(11).uniform(0, 1, (batch, 640, 640, 3)),
        jnp.float32)
    for _ in range(warmup):
        out = pipe(img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(img)
    jax.block_until_ready(out)
    return batch * iters / (time.perf_counter() - t0), run_name


def bench_train_sustained(batch: int = 32, iters: int = 6, warmup: int = 2):
    """END-TO-END training rate for the self-contained device path: the one
    jitted program with on-device photometric + homographic aug (windowed-
    DMA warps) + double forward + joint losses + update + EMA — the rate the
    S@640 runs actually trained at (no host-worker assumption; VERDICT r4
    #5 asked for the sustained number, not the device-only dispatch)."""
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights, make_train_step, rescale_yolo_gains,
    )

    H = W = 640
    mesh = make_mesh()
    model = build_model("YOLOPoint", "s", nc=80, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, H, W, 3),
        tx=make_optimizer(learning_rate=1e-3), ema=True,
    )
    aug = {
        "photometric": {
            "enable": True,
            "params_light": {"random_brightness": {"max_abs_change": 20},
                             "random_contrast": {"strength_range": [0.7, 1.3]}},
            "params": {"random_brightness": {"max_abs_change": 50},
                       "random_contrast": {"strength_range": [0.5, 1.5]},
                       "additive_gaussian_noise": {"stddev_range": [0, 10]}},
        },
        "homographic": {"enable": True, "params": {"patch_ratio": 0.85},
                        "valid_border_margin": 3},
        "warped_pair": {"params": {"patch_ratio": 0.85}},
    }
    obj = rescale_yolo_gains(ObjectLossConfig(), nc=80, img_size=H)
    weights = LossWeights(num_samples_per_image=600,
                          num_masked_non_matches_per_match=100)
    step = make_train_step(model, mesh, aug, obj, weights, 80,
                           donate=False, ema_decay=0.9999, ema_tau=2000.0)
    rng = np.random.default_rng(4)
    batch_np = {
        "image": rng.uniform(0, 1, (batch, H, W, 3)).astype(np.float32),
        "points": rng.uniform(8, H - 8, (batch, 200, 2)).astype(np.float32),
        "point_mask": np.ones((batch, 200), bool),
        "boxes": np.concatenate(
            [rng.uniform(100, 500, (batch, 30, 4)),
             rng.integers(0, 80, (batch, 30, 1)).astype(np.float32)], axis=-1
        ).astype(np.float32),
        "box_mask": np.ones((batch, 30), bool),
    }
    sb = shard_batch(batch_np, mesh)
    key = jax.random.PRNGKey(5)
    for _ in range(max(warmup, 2)):
        state, aux = step(state, sb, key)
        float(jax.device_get(aux["loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, sb, key)
    float(jax.device_get(aux["loss"]))
    return batch * iters / (time.perf_counter() - t0)


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
    value, stats = bench_throughput()
    kitti_n = bench_kitti_n()
    trained_img_s, trained_run = bench_trained_serving()
    train_img_s, train_mfu, host_warp_ms = bench_train_step()
    train_sustained = bench_train_sustained()
    # `trained` goes in the MIDDLE and compacted (VERDICT r4 #2): the driver
    # records only the tail of this line, so every perf field must come after
    # any variable-size payload.
    print(json.dumps({
        "metric": "yolopoint_s_640_inference",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / TORCH_CPU_BASELINE_IMG_S, 2),
        # measured img/s over the TOP of the optimized-A100 band
        # (BASELINE.md "A100-parity analysis": 4500 img/s at 0.30 MFU)
        "vs_a100_est": round(value / 4500.0, 3),
        "batch": BATCH,
        **_trained_metrics(),
        "batch1_ms_p50": round(batch1_ms, 3),
        "kpt_match_ms_p50": round(kpt_ms, 3),
        "precision": "bf16-fused",
        **stats,
        "kitti_n_img_s": round(kitti_n, 2),
        **({"trained_serving_img_s": round(trained_img_s, 2),
            "trained_serving_run": trained_run} if trained_img_s else {}),
        "train_img_s": round(train_img_s, 2),
        "train_mfu": train_mfu,
        "train_host_warp_ms": host_warp_ms,
        # end-to-end self-contained rate: on-device aug + step, one program
        "train_sustained_img_s": round(train_sustained, 2),
    }))
