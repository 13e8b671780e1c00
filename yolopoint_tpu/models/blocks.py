"""CSPDarknet building blocks in Flax (NHWC, bf16-friendly).

Semantics match `/root/reference/src/models/common.py` (Conv/Bottleneck/C3/
C2f/SPPF/...: BN eps 1e-3, torch momentum 0.03, SiLU activations, same-pad
rules) but the implementation is channels-last Flax with an optional compute
dtype so convolutions hit the MXU in bfloat16 while BN statistics stay f32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch BatchNorm2d(momentum=0.03) == flax BatchNorm(momentum=0.97)
BN_MOMENTUM = 0.97
BN_EPS = 1e-3


def make_divisible(x: float, divisor: int) -> int:
    """Round channel count up to a multiple of divisor
    (`/root/reference/src/utils/utils.py:41-43`)."""
    return math.ceil(x / divisor) * divisor


def autopad(k: int, p: Optional[int] = None) -> int:
    """'same' padding for odd kernels (`common.py:12-16`)."""
    return k // 2 if p is None else p


class ConvBnAct(nn.Module):
    """conv(no bias) + BN + SiLU — the reference `Conv` block (`common.py:22-34`).

    `fused=True` skips BN (weights already folded — inference `fuse()` path,
    `/root/reference/src/models/YOLOPoint.py:84-90`); then the conv has a bias.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.g,
            use_bias=self.fused,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fused:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=jnp.float32,
                name="bn",
            )(x)
        if self.act:
            x = nn.silu(x)
        return x


class DWConv(ConvBnAct):
    """Depth-wise variant (`common.py:37-40`): groups = gcd(c1, c2); caller
    passes g explicitly since flax modules don't know c1 until call time."""


class Bottleneck(nn.Module):
    """Standard bottleneck (`common.py:79-89`): 1x1 -> 3x3 with residual."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y = ConvBnAct(self.c2, 3, 1, g=self.g, dtype=self.dtype, fused=self.fused, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class BottleneckV8(nn.Module):
    """YOLOv8-style bottleneck with configurable kernels (`common.py:91-103`)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, self.k[0], 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y = ConvBnAct(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, fused=self.fused, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck (`common.py:105-121`)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype,
                            fused=self.fused, name=f"m_{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=jnp.float32, name="bn",
        )(y)
        y = nn.silu(y)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv4")(y, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (`common.py:123-135`)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype,
                            fused=self.fused, name=f"m_{i}")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv3")(y, train)


class C2f(nn.Module):
    """YOLOv8 CSP block with split + cascaded bottlenecks (`common.py:151-171`)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBnAct(2 * c, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                BottleneckV8(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype,
                             fused=self.fused, name=f"m_{i}")(parts[-1], train)
            )
        return ConvBnAct(self.c2, 1, dtype=self.dtype, fused=self.fused, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


def _maxpool_same(x, k: int, s: int = 1):
    """Max pool, kernel k, stride s, torch-style padding k//2."""
    pad = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def max_pool_2x2(x):
    """torch MaxPool2d(kernel_size=2, stride=2)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)),
    )


class SPP(nn.Module):
    """Spatial pyramid pooling (`common.py:197-210`)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        pools = [x] + [_maxpool_same(x, k) for k in self.k]
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class SPPF(nn.Module):
    """SPP-Fast: 3 cascaded 5x5 max pools (`common.py:213-229`)."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y1 = _maxpool_same(x, self.k)
        y2 = _maxpool_same(y1, self.k)
        y3 = _maxpool_same(y2, self.k)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class Focus(nn.Module):
    """Space-to-depth stem (`common.py:232-241`)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        patches = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return ConvBnAct(self.c2, self.k, self.s, self.p, self.g, self.act,
                         dtype=self.dtype, fused=self.fused, name="conv")(patches, train)


class GhostConv(nn.Module):
    """Ghost convolution (`common.py:244-254`)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBnAct(c_, self.k, self.s, None, self.g, self.act, dtype=self.dtype,
                      fused=self.fused, name="cv1")(x, train)
        y2 = ConvBnAct(c_, 5, 1, None, c_, self.act, dtype=self.dtype,
                       fused=self.fused, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (`common.py:257-269`)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="conv_0")(x, train)
        if self.s == 2:
            y = ConvBnAct(c_, self.k, self.s, g=math.gcd(c_, c_), act=False, dtype=self.dtype,
                          fused=self.fused, name="conv_1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, fused=self.fused, name="conv_2")(y, train)
        if self.s == 2:
            sc = ConvBnAct(x.shape[-1], self.k, self.s, g=x.shape[-1], act=False, dtype=self.dtype,
                           fused=self.fused, name="shortcut_0")(x, train)
            sc = ConvBnAct(self.c2, 1, 1, act=False, dtype=self.dtype, fused=self.fused,
                           name="shortcut_1")(sc, train)
        else:
            sc = x
        return y + sc


def upsample2x(x):
    """Nearest 2x upsample (torch Upsample(scale_factor=2, mode='nearest'))."""
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class TransformerLayer(nn.Module):
    """Single pre-norm-free transformer layer (`common.py:43-57`): QKV
    projections + MHA + 2-layer MLP, both residual, no LayerNorm."""

    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, B, C) token-major like the torch module
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c, dtype=self.dtype, name="ma"
        )
        x = attn(q.swapaxes(0, 1), k.swapaxes(0, 1), v.swapaxes(0, 1)).swapaxes(0, 1) + x
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return y + x


class TransformerBlock(nn.Module):
    """Vision-transformer block over flattened spatial tokens
    (`common.py:60-76`): optional input conv, learnable position embedding via
    a Dense layer, stacked TransformerLayers."""

    c2: int
    num_heads: int
    num_layers: int
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, dtype=self.dtype, fused=self.fused, name="conv")(x, train)
        B, H, W, C = x.shape
        p = x.reshape(B, H * W, C).swapaxes(0, 1)  # (HW, B, C)
        p = p + nn.Dense(self.c2, dtype=self.dtype, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p)
        return p.swapaxes(0, 1).reshape(B, H, W, self.c2)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner branch (`common.py:173-178`)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y1 = TransformerBlock(c_, 4, self.n, dtype=self.dtype, fused=self.fused, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv3")(y, train)


class C3SPP(nn.Module):
    """C3 with an SPP inner branch (`common.py:181-186`)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y1 = SPP(c_, self.k, dtype=self.dtype, fused=self.fused, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv3")(y, train)


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck inner blocks (`common.py:189-194`)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = GhostBottleneck(c_, dtype=self.dtype, fused=self.fused, name=f"m_{i}")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv3")(y, train)


class C3MP(nn.Module):
    """C3 variant with a stride-1 2x2 max-pool second branch (`common.py:137-149`)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, e=1.0, dtype=self.dtype,
                            fused=self.fused, name=f"m_{i}")(y1, train)
        # torch MaxPool2d(kernel_size=2, stride=1) (no padding -> H-1, W-1);
        # pad to keep concat shapes aligned, matching SAME-extent semantics
        y2 = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 2, 2, 1), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (0, 1), (0, 1), (0, 0)),
        )
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, dtype=self.dtype, fused=self.fused, name="cv3")(y, train)


def contract(x, gain: int = 2):
    """Width/height into channels (`common.py:272-283`): (B, H, W, C) ->
    (B, H/g, W/g, C*g^2) with torch Contract's channel ordering."""
    B, H, W, C = x.shape
    g = gain
    x = x.reshape(B, H // g, g, W // g, g, C)
    x = x.transpose(0, 2, 4, 5, 1, 3)  # (B, g, g, C, H/g, W/g)
    return x.reshape(B, g * g * C, H // g, W // g).transpose(0, 2, 3, 1)


def expand(x, gain: int = 2):
    """Channels into width/height (`common.py:286-297`), inverse ordering."""
    B, H, W, C = x.shape
    g = gain
    x = x.transpose(0, 3, 1, 2).reshape(B, g, g, C // g**2, H, W)
    x = x.transpose(0, 3, 4, 1, 5, 2)  # (B, C/g^2, H, g, W, g)
    return x.reshape(B, C // g**2, H * g, W * g).transpose(0, 2, 3, 1)
