"""Device-mesh parallelism (the NCCL/DDP surface of the reference, redone).

The reference scales with HuggingFace Accelerate DDP + NCCL all-reduce
(SURVEY.md §2.8). Here parallelism is single-controller JAX: a
`jax.sharding.Mesh` over the chips, batch sharded on the `data` axis,
parameters replicated, gradients reduced with `psum` inside a `shard_map`-ped
train step (collectives ride ICI; multi-host via `jax.distributed`).
"""

from yolopoint_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from yolopoint_tpu.parallel.spatial import (
    SPATIAL_AXIS,
    image_sharding,
    make_spatial_mesh,
    spatial_sharded_forward,
)
