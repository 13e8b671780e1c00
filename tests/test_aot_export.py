"""AOT serving-artifact export: serialize, reload, run, match the live
pipeline (`export/aot.py`)."""

import numpy as np
import jax
import jax.numpy as jnp

from yolopoint_tpu.export.aot import load_serving_artifact, save_serving_artifact
from yolopoint_tpu.frontend.pipeline import InferencePipeline
from yolopoint_tpu.models import build_model

CFG = {"detection_threshold": 0.015, "nms": 4, "top_k": 64, "max_det": 16}


def test_aot_roundtrip_matches_pipeline(tmp_path):
    m = build_model("YOLOPointDet", "n", nc=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3)), train=False)
    path = tmp_path / "yps.stablehlo"
    save_serving_artifact(path, m, v, CFG, batch=2, height=96, width=128,
                          compute_dtype=jnp.float32)
    serve = load_serving_artifact(path)
    assert serve.input_shape == (2, 96, 128, 3)
    assert serve.meta["config"]["top_k"] == 64

    img = np.random.default_rng(1).uniform(0, 1, (2, 96, 128, 3)).astype(np.float32)
    out = serve(img)
    ref = InferencePipeline(m, v, CFG, compute_dtype=jnp.float32)(img)
    np.testing.assert_allclose(
        np.asarray(out["keypoints"]), np.asarray(ref["keypoints"])
    )
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), np.asarray(ref["descriptors"]), atol=1e-6
    )


def test_aot_cli_smoke(tmp_path):
    from yolopoint_tpu.export.aot_cli import main

    out = tmp_path / "cli.stablehlo"
    main(["--out", str(out), "--model", "YOLOPointDet", "--version", "n",
          "--nc", "1", "--batch", "1", "--height", "96", "--width", "128",
          "--f32"])
    serve = load_serving_artifact(out)
    img = np.zeros((1, 96, 128, 3), np.float32)
    res = serve(img)
    assert res["keypoints"].shape[0] == 1
