"""Spatial (image-row) sharding over a 2-D (data, spatial) mesh — the
SP/CP analog for giant frames (SURVEY.md §2.8). XLA SPMD inserts the conv
halo exchanges; the sharded forward must match the replicated one."""

import numpy as np
import jax
import jax.numpy as jnp

from yolopoint_tpu.models import build_model
from yolopoint_tpu.parallel.spatial import (
    image_sharding,
    make_spatial_mesh,
    spatial_sharded_forward,
)


def test_spatial_sharded_forward_matches_replicated(rng):
    assert len(jax.devices()) == 8
    model = build_model("YOLOPointDet", "n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 128, 3)),
                           train=False)
    mesh = make_spatial_mesh(data=2, spatial=4)
    fwd = spatial_sharded_forward(model, variables, mesh)
    img = rng.uniform(0, 1, (2, 256, 128, 3)).astype(np.float32)
    sharded = jax.device_put(jnp.asarray(img), image_sharding(mesh))
    out = fwd(sharded)
    ref = model.apply(variables, jnp.asarray(img), train=False)
    np.testing.assert_allclose(np.asarray(out["semi"]), np.asarray(ref["semi"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["desc"]), np.asarray(ref["desc"]),
                               atol=1e-4)
    # rows really are sharded across the spatial axis
    assert "spatial" in str(out["semi"].sharding.spec)


def test_data_parallel_inference_pipeline():
    """InferencePipeline.sharded(): batch split over the 8-device data mesh
    gives the same outputs as the single-device pipeline."""
    import jax.numpy as jnp

    from yolopoint_tpu.frontend.pipeline import InferencePipeline
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch

    m = build_model("YOLOPointDet", "n", nc=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    pipe = InferencePipeline(
        m, v, {"detection_threshold": 0.015, "nms": 4, "top_k": 32},
        compute_dtype=jnp.float32,
    )
    imgs = np.random.default_rng(0).uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    ref = pipe(imgs)

    mesh = make_mesh(jax.devices()[:8])
    fn = pipe.sharded(mesh)
    out = fn(shard_batch({"x": imgs}, mesh)["x"])
    np.testing.assert_allclose(
        np.asarray(out["keypoints"]), np.asarray(ref["keypoints"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), np.asarray(ref["descriptors"]), atol=1e-5
    )
