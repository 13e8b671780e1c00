"""Headline benchmark: YOLOPoint-S 640px single-image inference
(boxes + keypoints + descriptors, full device-resident decode) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the torch-CPU reference path for the same model/size measured on
this machine (see TORCH_CPU_BASELINE_IMG_S below; re-measure with
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


def bench_tpu(batch: int = 1, iters: int = 30, warmup: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model

    H = W = 640
    model = build_model("YOLOPoint", "s", nc=80)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    pipe = InferencePipeline(
        model, variables,
        {"detection_threshold": 0.015, "nms": 4, "top_k": 1000,
         "conf_thresh": 0.25, "iou_thresh": 0.45, "max_det": 300},
        compute_dtype=jnp.bfloat16,
    )
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, H, W, 3)), jnp.float32)

    for _ in range(warmup):
        out = pipe(img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(img)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


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


if __name__ == "__main__":
    if "--measure-torch" in sys.argv:
        ips = measure_torch_cpu()
        print(f"torch-cpu: {ips:.3f} img/s")
        sys.exit(0)
    value = bench_tpu()
    print(json.dumps({
        "metric": "yolopoint_s_640_inference",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / TORCH_CPU_BASELINE_IMG_S, 2),
    }))
