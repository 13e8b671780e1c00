"""Ahead-of-time export of the inference pipeline to a self-contained
serving artifact (StableHLO via `jax.export`).

The reference ships deployment as Python + checkpoint (the ROS nodes
re-instantiate the torch model per process, `/root/reference/src/demo.py:34-49`).
The TPU-native serving story is stronger: trace the full fused pipeline
(forward + device decode, params baked in), serialize the compiled-portable
StableHLO module, and run it from any JAX process — no model code, no
checkpoint loading, no Flax — with stable shapes and dtypes. The artifact
is a single file; `load_serving_artifact` returns a callable.

Usage:
    save_serving_artifact("yps.stablehlo", model, variables, config,
                          batch=1, height=640, width=640)
    serve = load_serving_artifact("yps.stablehlo")
    out = serve(images)          # {'keypoints': ..., 'boxes': ...}
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Mapping, Optional

import numpy as np

_MAGIC = b"YPTPU1\n"


def save_serving_artifact(
    path,
    model,
    variables: Mapping[str, Any],
    config: Optional[Mapping[str, Any]] = None,
    batch: int = 1,
    height: int = 640,
    width: int = 640,
    channels: int = 3,
    compute_dtype=None,
) -> None:
    """Trace the InferencePipeline at a fixed shape and serialize it.

    Params are closed over (baked into the module as constants), so the
    artifact is fully self-contained. The sidecar JSON header records the
    input spec and the operating-point config for the loader.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from yolopoint_tpu.frontend.pipeline import InferencePipeline

    compute_dtype = compute_dtype or jnp.bfloat16
    pipe = InferencePipeline(model, variables, config, compute_dtype=compute_dtype)

    def serve(images):
        return pipe._process(images)

    spec = jax.ShapeDtypeStruct((batch, height, width, channels), jnp.float32)
    exp = jexport.export(jax.jit(serve))(spec)
    blob = exp.serialize()
    header = json.dumps({
        "input_shape": [batch, height, width, channels],
        "input_dtype": "float32",
        "config": dict(config or {}),
        "platforms": list(exp.platforms),
    }).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)


class ServingModule:
    """A loaded serving artifact: `module(images) -> dict of arrays`."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.input_shape = tuple(meta["input_shape"])

    def __call__(self, images) -> dict:
        import jax.numpy as jnp

        return self._exported.call(jnp.asarray(images, jnp.float32))


def load_serving_artifact(path) -> ServingModule:
    from jax import export as jexport

    raw = Path(path).read_bytes()
    if not raw.startswith(_MAGIC):
        raise ValueError(f"{path}: not a yolopoint_tpu serving artifact")
    off = len(_MAGIC)
    (hlen,) = struct.unpack_from("<I", raw, off)
    off += 4
    meta = json.loads(raw[off:off + hlen].decode())
    exported = jexport.deserialize(raw[off + hlen:])
    return ServingModule(exported, meta)
