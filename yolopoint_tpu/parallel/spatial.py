"""Spatial sharding: split giant images across devices (the SP/CP analog).

The reference has no sequence dimension; its "long context" is image
resolution, handled by cropping (SURVEY.md §2.8). The TPU-native alternative
for genuinely giant frames (satellite/panorama inference, large-crop
training) is to shard the HEIGHT dimension of the activations across a
`spatial` mesh axis and let XLA's SPMD partitioner insert the conv halo
exchanges automatically — no manual ppermute, no kernel changes; the same
Flax model runs unmodified.

Mesh layout: `(data, spatial)` — batch over `data`, rows over `spatial`.
For a 2-axis mesh of 8 devices as (2, 4), each device holds B/2 x H/4 rows;
every convolution exchanges only its receptive-field halo rows over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_spatial_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = 1,
    spatial: Optional[int] = None,
) -> Mesh:
    """2-D `(data, spatial)` mesh. `spatial` defaults to n_devices / data."""
    devices = list(devices) if devices is not None else jax.devices()
    spatial = spatial or len(devices) // data
    assert data * spatial == len(devices), "data * spatial must cover devices"
    return Mesh(np.asarray(devices).reshape(data, spatial), (DATA_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding: batch over `data`, rows (H) over `spatial`."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharded_forward(model, variables, mesh: Mesh):
    """Jitted forward whose input images are row-sharded across `spatial`.

    Params are replicated; XLA SPMD inserts halo exchanges for every conv /
    pooling window crossing shard boundaries. Outputs inherit the spatial
    sharding (semi/desc maps row-sharded at their strides).

    Usage:
        mesh = make_spatial_mesh(data=2, spatial=4)
        fwd = spatial_sharded_forward(model, variables, mesh)
        out = fwd(jax.device_put(images, image_sharding(mesh)))
    """
    var_sharded = jax.device_put(variables, replicated(mesh))

    @jax.jit
    def fwd(images):
        images = jax.lax.with_sharding_constraint(images, image_sharding(mesh))
        return model.apply(var_sharded, images, train=False)

    return fwd
