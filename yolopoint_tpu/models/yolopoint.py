"""YOLOPoint model family in Flax (NHWC).

Architectures re-designed from `/root/reference/src/models/YOLOPoint.py`:

* `YOLOPoint`    — main net (`:148-246`): shared CSP backbone, 65-ch keypoint
                   detector head @ stride 8, fused stride-4/16 descriptor head
                   (L2-normalized), YOLO PANet neck + anchor Detect on P3/4/5.
* `YOLOPointv52` — v8-style variant with C2f blocks (`:248-342`).
* `YOLOPointDet` — points + descriptors only (`:344-396`).
* `SuperPointNet`— classic VGG SuperPoint (`:398-451`).
* `YOLOv8Point`  — v8 backbone with late point heads (`:453-547`). NOTE: the
                   reference has a desc-normalization bug at `:544-545`
                   (normalizes the norm); we implement the correct
                   normalization.

Width/depth multipliers per version follow `:36-49`
(n 0.33/0.25, s 0.33/0.5, m 0.67/0.75, l 1.0/1.0, x 1.33/1.25) with
channels `make_divisible(2^k * wm, 8)` for k=6..10 (`:152-153`).

Outputs are a dict `{semi, desc, objects}` like the reference forward
(`:246`), with NHWC tensors: `semi (B, Hc, Wc, 65)`, `desc (B, Hc, Wc, D)`
unit-normalized, `objects` = raw Detect levels (+ decoded tensor when
`decode=True`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from yolopoint_tpu.models.blocks import (
    C3,
    C2f,
    ConvBnAct,
    SPPF,
    make_divisible,
    max_pool_2x2,
    upsample2x,
)
from yolopoint_tpu.models.detect import ANCHORS_DEFAULT, Detect

VERSION_MULTIPLIERS = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.5),
    "m": (0.67, 0.75),
    "l": (1.0, 1.0),
    "x": (1.33, 1.25),
}


def _l2_normalize(desc: jax.Array) -> jax.Array:
    """Channel L2 normalization (reference `:219-220`)."""
    dn = jnp.linalg.norm(desc.astype(jnp.float32), axis=-1, keepdims=True)
    return desc / jnp.maximum(dn, 1e-12)


def _widths(width_multiple: float) -> tuple[int, int, int, int, int]:
    return tuple(make_divisible(2**k * width_multiple, 8) for k in range(6, 11))


def _depths(depth_multiple: float) -> tuple[int, int, int]:
    return tuple(max(round(k * depth_multiple), 1) for k in (3, 6, 9))


class YOLOPoint(nn.Module):
    """Main YOLOPoint (v5-style) — `/root/reference/src/models/YOLOPoint.py:148-246`."""

    width_multiple: float = 1.0
    depth_multiple: float = 1.0
    nc: int = 80
    anchors: Sequence[Sequence[float]] = ANCHORS_DEFAULT
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = False):
        c1, c2, c3, c4, c5 = _widths(self.width_multiple)
        n1, n2, n3 = _depths(self.depth_multiple)
        kw = dict(dtype=self.dtype, fused=self.fused)

        # CSPNet shared backbone
        x = ConvBnAct(c1, 6, 2, 2, name="Conv1", **kw)(x, train)
        x = ConvBnAct(c2, 3, 2, name="Conv2", **kw)(x, train)
        xa = C3(c2, n1, name="Bottleneck1", **kw)(x, train)
        x = ConvBnAct(c3, 3, 2, name="Conv3", **kw)(xa, train)

        # keypoint detector head (stride 8, 65 channels)
        semi = C3(c3, n1, name="BottleneckDet", **kw)(x, train)
        semi = nn.Conv(65, (1, 1), use_bias=False, dtype=self.dtype, name="ConvDet")(semi)

        # desc + YOLO encoder
        xb = C3(c3, n2, name="Bottleneck2", **kw)(x, train)

        # descriptor head: stride-4 branch + upsampled stride-16 branch
        descA = ConvBnAct(c2, 3, 2, 1, name="ConvDescA", **kw)(xa, train)
        descB = ConvBnAct(c2, 3, 2, 1, name="ConvDescB", **kw)(xb, train)
        descB = upsample2x(descB)
        desc = jnp.concatenate([descA, descB], axis=-1)
        desc = C3(c3, n1, name="BottleneckDesc", **kw)(desc, train)
        desc = nn.Conv(c3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name="ConvDesc")(desc)
        desc = _l2_normalize(desc)

        # YOLO-exclusive encoder
        x = ConvBnAct(c4, 3, 2, name="Conv4", **kw)(xb, train)
        xc = C3(c4, n3, name="Bottleneck3", **kw)(x, train)
        x = ConvBnAct(c5, 3, 2, name="Conv5", **kw)(xc, train)
        x = C3(c5, n1, name="Bottleneck4", **kw)(x, train)
        x = SPPF(c5, 5, name="SPPooling", **kw)(x, train)

        # PANet neck
        xd = ConvBnAct(c4, 1, 1, 0, name="Conv6", **kw)(x, train)
        x = upsample2x(xd)
        x = jnp.concatenate([x, xc], axis=-1)
        x = C3(c4, n1, name="Bottleneck5", **kw)(x, train)
        xe = ConvBnAct(c3, 1, 1, 0, name="Conv7", **kw)(x, train)
        x = upsample2x(xe)
        x = jnp.concatenate([x, xb], axis=-1)
        xf = C3(c3, n1, name="Bottleneck6", **kw)(x, train)
        x = ConvBnAct(c3, 3, 2, 1, name="Conv8", **kw)(xf, train)
        x = jnp.concatenate([x, xe], axis=-1)
        xg = C3(c4, n1, name="Bottleneck7", **kw)(x, train)
        x = ConvBnAct(c4, 3, 2, 1, name="Conv9", **kw)(xg, train)
        x = jnp.concatenate([x, xd], axis=-1)
        x = C3(c5, n1, name="Bottleneck8", **kw)(x, train)
        objects = Detect(self.nc, self.anchors, (8, 16, 32), dtype=self.dtype, name="Detect")(
            [xf, xg, x], decode=decode
        )

        return {"semi": semi, "desc": desc, "objects": objects}


class YOLOPointv52(nn.Module):
    """v8-style experimental variant — `/root/reference/src/models/YOLOPoint.py:248-342`."""

    width_multiple: float = 1.0
    depth_multiple: float = 1.0
    nc: int = 80
    anchors: Sequence[Sequence[float]] = ANCHORS_DEFAULT
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = False):
        c1, c2, c3, c4, c5 = _widths(self.width_multiple)
        n1, n2, n3 = _depths(self.depth_multiple)
        kw = dict(dtype=self.dtype, fused=self.fused)

        x = ConvBnAct(c1, 6, 2, 2, name="Conv1", **kw)(x, train)
        x = ConvBnAct(c2, 3, 2, name="Conv2", **kw)(x, train)
        xa = C2f(c2, n1, name="Bottleneck1", **kw)(x, train)
        x = ConvBnAct(c3, 3, 2, name="Conv3", **kw)(xa, train)

        semi = C2f(65, n1, name="BottleneckDet", **kw)(x, train)

        xb = C2f(c3, n2, name="Bottleneck2", **kw)(x, train)

        descA = max_pool_2x2(xa)
        descB = ConvBnAct(c2, 3, 2, 1, name="ConvDescB", **kw)(xb, train)
        descB = upsample2x(descB)
        desc = jnp.concatenate([descA, descB], axis=-1)
        desc = C2f(c3, n1, name="BottleneckDesc", **kw)(desc, train)
        desc = _l2_normalize(desc)

        x = ConvBnAct(c4, 3, 2, name="Conv4", **kw)(xb, train)
        xc = C2f(c4, n3, name="Bottleneck3", **kw)(x, train)
        x = ConvBnAct(c4, 3, 2, name="Conv5", **kw)(xc, train)
        x = C2f(c4, n1, name="Bottleneck4", **kw)(x, train)
        xd = SPPF(c4, 5, name="SPPooling", **kw)(x, train)

        x = upsample2x(xd)
        x = jnp.concatenate([x, xc], axis=-1)
        xe = C2f(c4, n1, name="Bottleneck5", **kw)(x, train)
        x = upsample2x(xe)
        x = jnp.concatenate([x, xb], axis=-1)
        xf = C2f(c3, n1, name="Bottleneck6", **kw)(x, train)
        x = ConvBnAct(c3, 3, 2, 1, name="Conv8", **kw)(xf, train)
        x = jnp.concatenate([x, xe], axis=-1)
        xg = C2f(c4, n1, name="Bottleneck7", **kw)(x, train)
        x = ConvBnAct(c4, 3, 2, 1, name="Conv9", **kw)(xg, train)
        x = jnp.concatenate([x, xd], axis=-1)
        x = C2f(c4, n1, name="Bottleneck8", **kw)(x, train)
        objects = Detect(self.nc, self.anchors, (8, 16, 32), dtype=self.dtype, name="Detect")(
            [xf, xg, x], decode=decode
        )

        return {"semi": semi, "desc": desc, "objects": objects}


class YOLOPointDet(nn.Module):
    """Points + descriptors only — `/root/reference/src/models/YOLOPoint.py:344-396`."""

    width_multiple: float = 1.0
    depth_multiple: float = 1.0
    nc: Optional[int] = None
    anchors: Any = None
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = False):
        c1, c2, c3, c4, c5 = _widths(self.width_multiple)
        n1, n2, n3 = _depths(self.depth_multiple)
        kw = dict(dtype=self.dtype, fused=self.fused)

        x = ConvBnAct(c1, 6, 2, 2, name="Conv1", **kw)(x, train)
        x = ConvBnAct(c2, 3, 2, name="Conv2", **kw)(x, train)
        xa = C3(c2, n1, name="Bottleneck1", **kw)(x, train)
        x = ConvBnAct(c3, 3, 2, name="Conv3", **kw)(xa, train)

        semi = C3(c3, n1, name="BottleneckDet", **kw)(x, train)
        semi = nn.Conv(65, (1, 1), use_bias=False, dtype=self.dtype, name="ConvDet")(semi)

        xb = C3(c3, n2, name="Bottleneck2", **kw)(x, train)

        descA = ConvBnAct(c2, 3, 2, 1, name="ConvDescA", **kw)(xa, train)
        descB = ConvBnAct(c2, 3, 2, 1, name="ConvDescB", **kw)(xb, train)
        descB = upsample2x(descB)
        desc = jnp.concatenate([descA, descB], axis=-1)
        desc = C3(c3, n1, name="BottleneckDesc", **kw)(desc, train)
        desc = nn.Conv(c3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name="ConvDesc")(desc)
        desc = _l2_normalize(desc)

        return {"semi": semi, "desc": desc}


class SuperPointNet(nn.Module):
    """Classic VGG-style SuperPoint — `/root/reference/src/models/YOLOPoint.py:398-451`.

    Plain convs + ReLU + 2x2 max pools; semi 65ch + desc 256ch at stride 8.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = False):
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256

        def conv(c, k, name):
            pad = k // 2
            return nn.Conv(c, (k, k), padding=((pad, pad), (pad, pad)),
                           dtype=self.dtype, name=name)

        x = nn.relu(conv(c1, 3, "conv1a")(x))
        x = nn.relu(conv(c1, 3, "conv1b")(x))
        x = max_pool_2x2(x)
        x = nn.relu(conv(c2, 3, "conv2a")(x))
        x = nn.relu(conv(c2, 3, "conv2b")(x))
        x = max_pool_2x2(x)
        x = nn.relu(conv(c3, 3, "conv3a")(x))
        x = nn.relu(conv(c3, 3, "conv3b")(x))
        x = max_pool_2x2(x)
        x = nn.relu(conv(c4, 3, "conv4a")(x))
        x = nn.relu(conv(c4, 3, "conv4b")(x))
        cPa = nn.relu(conv(c5, 3, "convPa")(x))
        semi = conv(65, 1, "convPb")(cPa)
        cDa = nn.relu(conv(c5, 3, "convDa")(x))
        desc = conv(d1, 1, "convDb")(cDa)
        desc = _l2_normalize(desc)
        return {"semi": semi, "desc": desc}


class YOLOv8Point(nn.Module):
    """v8 backbone with late point heads — `/root/reference/src/models/YOLOPoint.py:453-547`."""

    width_multiple: float = 1.0
    depth_multiple: float = 1.0
    nc: int = 80
    anchors: Sequence[Sequence[float]] = ANCHORS_DEFAULT
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = False):
        c1, c2, c3, c4, c5 = _widths(self.width_multiple)
        n1, n2, n3 = _depths(self.depth_multiple)
        kw = dict(dtype=self.dtype, fused=self.fused)
        r = 1

        x = ConvBnAct(c1, 3, 2, 1, name="Conv0", **kw)(x, train)
        x = ConvBnAct(c2, 3, 2, 1, name="Conv1", **kw)(x, train)
        xa = C2f(c2, n1, shortcut=True, name="Bottleneck2", **kw)(x, train)
        x = ConvBnAct(c3, 3, 2, 1, name="Conv3", **kw)(xa, train)
        xb = C2f(c3, n2, shortcut=True, name="Bottleneck4", **kw)(x, train)
        # NOTE: the reference feeds Conv5 with x (pre-Bottleneck4 output), not
        # xb — `/root/reference/src/models/YOLOPoint.py:509`; kept as-is.
        x = ConvBnAct(c4, 3, 2, 1, name="Conv5", **kw)(x, train)
        xc = C2f(c4, n2, shortcut=True, name="Bottleneck6", **kw)(x, train)
        x = ConvBnAct(c4 * r, 3, 2, 1, name="Conv7", **kw)(xc, train)
        x = C2f(c4 * r, n1, shortcut=True, name="Bottleneck8", **kw)(x, train)
        xd = SPPF(c4 * r, 5, name="SPPooling9", **kw)(x, train)

        x = upsample2x(xd)
        x = jnp.concatenate([x, xc], axis=-1)
        xe = C2f(c4, n1, name="Bottleneck12", **kw)(x, train)
        x = upsample2x(xe)
        x = jnp.concatenate([x, xb], axis=-1)
        xf = C2f(c3, n1, name="Bottleneck15", **kw)(x, train)
        x = ConvBnAct(c3, 3, 2, 1, name="Conv16", **kw)(xf, train)
        x = jnp.concatenate([x, xe], axis=-1)
        xg = C2f(c4, n1, name="Bottleneck18", **kw)(x, train)
        x = ConvBnAct(c4, 3, 2, 1, name="Conv19", **kw)(xg, train)
        x = jnp.concatenate([x, xd], axis=-1)
        x = C2f(c4 * r, n1, name="Bottleneck21", **kw)(x, train)
        objects = Detect(self.nc, self.anchors, (8, 16, 32), dtype=self.dtype, name="Detect")(
            [xf, xg, x], decode=decode
        )

        # YP neck
        xc2 = ConvBnAct(c3, 3, 1, 1, name="Conv22", **kw)(xc, train)
        xc2 = upsample2x(xc2)
        xc2 = jnp.concatenate([xc2, xb], axis=-1)
        xc2 = ConvBnAct(c3, 3, 1, 1, name="Conv25", **kw)(xc2, train)
        xa2 = max_pool_2x2(xa)
        xa2 = jnp.concatenate([xa2, xc2], axis=-1)

        semi = C2f(65, n1, name="BottleneckDet", **kw)(xa2, train)
        desc = C2f(c3, n1, name="BottleneckDesc", **kw)(xa2, train)
        desc = nn.Conv(c3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name="ConvDesc")(desc)
        desc = _l2_normalize(desc)

        return {"semi": semi, "desc": desc, "objects": objects}


MODEL_REGISTRY = {
    "YOLOPoint": YOLOPoint,
    "YOLOPointv52": YOLOPointv52,
    "YOLOPointDet": YOLOPointDet,
    "SuperPointNet": SuperPointNet,
    "YOLOv8Point": YOLOv8Point,
}

# Torch attribute declaration order of each reference architecture — the
# order `named_parameters()` walks modules, which published `freeze_layers`
# index specs count in (`/root/reference/src/models/YOLOPoint.py:156-196,
# 257-292,352-369,407-421,461-499`; `configs/kitti.yaml:168-173`). Used by
# `training.state.freeze_mask_from_spec`.
REFERENCE_MODULE_ORDER = {
    "YOLOPoint": [
        "Conv1", "Conv2", "Bottleneck1", "Conv3", "Bottleneck2",
        "Conv4", "Bottleneck3", "Conv5", "Bottleneck4", "SPPooling",
        "Conv6", "Bottleneck5", "Conv7", "Bottleneck6", "Conv8",
        "Bottleneck7", "Conv9", "Bottleneck8", "Detect",
        "BottleneckDet", "ConvDet", "ConvDescB", "ConvDescA",
        "BottleneckDesc", "ConvDesc",
    ],
    "YOLOPointv52": [
        "Conv1", "Conv2", "Bottleneck1", "Conv3", "Bottleneck2",
        "Conv4", "Bottleneck3", "Conv5", "Bottleneck4", "SPPooling",
        "Bottleneck5", "Bottleneck6", "Conv8", "Bottleneck7", "Conv9",
        "Bottleneck8", "Detect", "BottleneckDet", "ConvDescB",
        "BottleneckDesc",
    ],
    "YOLOPointDet": [
        "Conv1", "Conv2", "Bottleneck1", "Conv3", "Bottleneck2",
        "BottleneckDet", "ConvDet", "ConvDescB", "ConvDescA",
        "BottleneckDesc", "ConvDesc",
    ],
    "SuperPointNet": [
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ],
    "YOLOv8Point": [
        "Conv0", "Conv1", "Bottleneck2", "Conv3", "Bottleneck4", "Conv5",
        "Bottleneck6", "Conv7", "Bottleneck8", "SPPooling9", "Bottleneck12",
        "Bottleneck15", "Conv16", "Bottleneck18", "Conv19", "Bottleneck21",
        "Detect", "Conv22", "Conv25", "BottleneckDet", "BottleneckDesc",
        "ConvDesc",
    ],
}


def build_model(
    model_name: str = "YOLOPoint",
    version: Optional[str] = "s",
    nc: int = 80,
    anchors=None,
    dtype: Any = jnp.float32,
    fused: bool = False,
) -> nn.Module:
    """Instantiate an architecture by name + version letter.

    Mirrors the reference's reflection-based `load_model` + `Model.__init__`
    (`/root/reference/src/models/YOLOPoint.py:17-68`,
    `/root/reference/src/utils/utils.py:55-57`).
    """
    if model_name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model {model_name!r}; choose from {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[model_name]
    if cls is SuperPointNet:
        return cls(dtype=dtype)
    if version is None:
        dm, wm = 1.0, 1.0
    else:
        v = version.lower()
        if v not in VERSION_MULTIPLIERS:
            raise ValueError(f"version {version!r} not in {sorted(VERSION_MULTIPLIERS)}")
        dm, wm = VERSION_MULTIPLIERS[v]
    kwargs = dict(width_multiple=wm, depth_multiple=dm, dtype=dtype)
    if cls is not YOLOPointDet:
        kwargs["nc"] = nc
        kwargs["anchors"] = tuple(tuple(a) for a in anchors) if anchors else ANCHORS_DEFAULT
        kwargs["fused"] = fused
    else:
        kwargs["fused"] = fused
    return cls(**kwargs)
