"""Fused (BN-folded) inference parity: the deployed bf16+fused path of
bench.py / the demo frontend must match the unfused f32 model.

Reference behavior: `Model.fuse` folds each conv+BN pair at load time
(`/root/reference/src/models/YOLOPoint.py:84-90`,
`/root/reference/src/utils/torch_utils_yolo.py:194-214`); we fold at
parameter level (`models/convert.py:fold_batch_norm`) and run the same
architecture with `fused=True`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolopoint_tpu.models import build_model
from yolopoint_tpu.models.convert import fold_batch_norm


def _randomize_bn_stats(variables, rng):
    """Give BN non-trivial running stats + affine params so folding is
    actually exercised (fresh init is mean=0/var=1/scale=1/bias=0 and would
    make folding a no-op)."""

    def rand_like(x, lo, hi):
        return np.asarray(rng.uniform(lo, hi, np.shape(x)), np.float32)

    def walk_params(node):
        for k, v in node.items():
            if k == "bn":
                v["scale"] = rand_like(v["scale"], 0.5, 1.5)
                v["bias"] = rand_like(v["bias"], -0.3, 0.3)
            elif isinstance(v, dict):
                walk_params(v)

    def walk_stats(node):
        for k, v in node.items():
            if "mean" in v and "var" in v and not isinstance(v["mean"], dict):
                v["mean"] = rand_like(v["mean"], -0.5, 0.5)
                v["var"] = rand_like(v["var"], 0.5, 2.0)
            elif isinstance(v, dict):
                walk_stats(v)

    variables = jax.tree_util.tree_map(np.asarray, variables)
    walk_params(variables["params"])
    walk_stats(variables["batch_stats"])
    return variables


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    model = build_model("YOLOPoint", "n", nc=4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 96, 128, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn_stats(variables, rng)
    ref = model.apply(variables, x, train=False, decode=True)
    return variables, x, ref


def test_fold_batch_norm_exact_f32(setup):
    """fused=True + folded params reproduces the unfused f32 forward."""
    variables, x, ref = setup
    folded = fold_batch_norm(variables)
    fused_model = build_model("YOLOPoint", "n", nc=4, fused=True)
    out = fused_model.apply(folded, x, train=False, decode=True)
    np.testing.assert_allclose(np.asarray(out["semi"]), np.asarray(ref["semi"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["desc"]), np.asarray(ref["desc"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["objects"][0]), np.asarray(ref["objects"][0]),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_fused_bf16_close_to_f32(setup):
    """The bench/deploy path (bf16 convs + folded BN) stays within bf16
    tolerance of the f32 reference forward."""
    variables, x, ref = setup
    folded = fold_batch_norm(variables)
    fused_bf16 = build_model("YOLOPoint", "n", nc=4, dtype=jnp.bfloat16, fused=True)
    out = fused_bf16.apply(folded, x.astype(jnp.bfloat16), train=False, decode=True)

    semi = np.asarray(out["semi"], np.float32)
    ref_semi = np.asarray(ref["semi"], np.float32)
    scale = max(np.abs(ref_semi).max(), 1.0)
    assert np.abs(semi - ref_semi).max() / scale < 0.08

    desc = np.asarray(out["desc"], np.float32)
    ref_desc = np.asarray(ref["desc"], np.float32)
    # descriptors are unit-normalized; cosine similarity is the right metric
    cos = (desc * ref_desc).sum(-1)
    assert cos.min() > 0.98

    dec = np.asarray(out["objects"][0], np.float32)
    ref_dec = np.asarray(ref["objects"][0], np.float32)
    # decoded xywh are in pixel units; obj/cls are sigmoids in [0,1]
    assert np.abs(dec[..., 4:] - ref_dec[..., 4:]).max() < 0.05
    assert np.abs(dec[..., :4] - ref_dec[..., :4]).max() < 2.5


def test_uint8_ingest_matches_float():
    """u8 batches are normalized on device and match the f32 path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model

    m = build_model("YOLOPointDet", "n", nc=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), train=False)
    pipe = InferencePipeline(m, v, {"top_k": 32}, compute_dtype=jnp.float32)
    u8 = np.random.default_rng(0).integers(0, 256, (2, 64, 96, 3), np.uint8)
    a = pipe(u8)
    b = pipe(u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(
        np.asarray(a["keypoints"]), np.asarray(b["keypoints"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["kp_scores"]), np.asarray(b["kp_scores"]), atol=1e-6
    )
