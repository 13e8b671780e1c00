"""YOLOv5 anchor-based Detect head in Flax (NHWC, static grids under jit).

Semantics follow `/root/reference/src/models/yolo.py:34-81`: per-level 1x1
conv to `na*(nc+5)` channels; training returns raw `(B, na, ny, nx, no)`
tensors; inference additionally decodes
`xy = (2σ-0.5+grid)·stride`, `wh = (2σ)²·anchor`, and concatenates all
levels to `(B, ΣN, no)`. Grids are generated with `broadcasted_iota` from
static shapes — no cached buffers, no dynamic reallocation.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# default anchors, /root/reference/src/models/YOLOPoint.py:11-15 (pixel units)
ANCHORS_DEFAULT = (
    (10, 13, 16, 30, 33, 23),
    (30, 61, 62, 45, 59, 119),
    (116, 90, 156, 198, 373, 326),
)


def check_anchor_order(anchors: np.ndarray, strides: Sequence[int]) -> np.ndarray:
    """Flip anchors if their area order disagrees with stride order.

    Parity: `_check_anchor_order` `/root/reference/src/models/YOLOPoint.py:21-28`.
    `anchors` is `(nl, na, 2)` in *per-stride* units.
    """
    a = anchors.prod(-1).reshape(-1)
    da = a[-1] - a[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        anchors = anchors[::-1].copy()
    return anchors


class Detect(nn.Module):
    """Anchor-based multi-level detection head.

    Attributes:
      nc: number of classes.
      anchors: `(nl, na*2)` pixel-space anchors.
      strides: per-level strides (static; the reference derives them with a
        dummy forward — here they are known by construction: (8, 16, 32)).
    """

    nc: int = 80
    anchors: Sequence[Sequence[float]] = ANCHORS_DEFAULT
    strides: Sequence[int] = (8, 16, 32)
    dtype: Any = jnp.float32

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    def anchors_per_stride(self) -> np.ndarray:
        """(nl, na, 2) anchors divided by stride, order-checked — matches the
        buffer the reference stores after `Model.__init__`
        (`/root/reference/src/models/YOLOPoint.py:61-67`)."""
        a = np.asarray(self.anchors, np.float32).reshape(self.nl, -1, 2)
        a = a / np.asarray(self.strides, np.float32)[:, None, None]
        return check_anchor_order(a, self.strides)

    def _bias_init(self, level: int):
        """Focal-style prior biases: obj ~ 8 objects/640px image at this
        stride, cls ~ 0.6/(nc-1) — the reference `_initialize_biases`
        (`/root/reference/src/models/YOLOPoint.py:92-100`)."""
        import math

        stride = float(self.strides[level])
        b = np.zeros((self.na, self.no), np.float32)
        b[:, 4] += math.log(8.0 / (640.0 / stride) ** 2)
        if self.nc > 1:
            b[:, 5:] += math.log(0.6 / (self.nc - 0.999999))

        def init(key, shape, dtype=jnp.float32):
            del key
            return jnp.asarray(b.reshape(-1), dtype).reshape(shape)

        return init

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], decode: bool = False):
        """Args:
          feats: nl feature maps `(B, Hi, Wi, Ci)`, strides ascending.
          decode: False -> raw training tensors only; True -> also return
            concatenated decoded predictions.

        Returns:
          raw: list of `(B, na, ny, nx, no)` (torch layout kept for loss and
            converter parity).
          If decode: `(decoded (B, ΣN, no), raw)`.
        """
        anchors_ps = self.anchors_per_stride()  # (nl, na, 2)
        raw = []
        decoded = []
        for i, x in enumerate(feats):
            B, ny, nx, _ = x.shape
            y = nn.Conv(self.no * self.na, (1, 1), dtype=self.dtype,
                        bias_init=self._bias_init(i), name=f"m_{i}")(x)
            # (B, ny, nx, na*no) -> (B, na, ny, nx, no); channel order is
            # (na, no) fastest-last like torch's view(bs, na, no, ny, nx)
            y = y.reshape(B, ny, nx, self.na, self.no).transpose(0, 3, 1, 2, 4)
            raw.append(y)
            if decode:
                stride = float(self.strides[i])
                sig = jax.nn.sigmoid(y.astype(jnp.float32))
                gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
                gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
                grid = jnp.stack([gx, gy], axis=-1)[None, None]  # (1,1,ny,nx,2)
                anchor_grid = (
                    jnp.asarray(anchors_ps[i]) * stride
                ).reshape(1, self.na, 1, 1, 2)
                xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
                wh = (sig[..., 2:4] * 2.0) ** 2 * anchor_grid
                out = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
                decoded.append(out.reshape(B, -1, self.no))
        if decode:
            return jnp.concatenate(decoded, axis=1), raw
        return raw
