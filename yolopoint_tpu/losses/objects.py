"""YOLOv5 object loss with a fully vectorized, fixed-shape build_targets.

Re-design of `ComputeObjectLoss`
(`/root/reference/src/utils/loss_functions.py:90-234`): the reference's
data-dependent target expansion (anchor wh-ratio filter, then a boolean-index
expansion over 5 neighbor-cell offsets) becomes a dense
`(B, M, na, 5)` candidate tensor with a validity mask — no dynamic shapes, so
the whole loss jits into the train step.

Semantics preserved:
* anchor match: `max(r, 1/r).max() < anchor_t` on wh ratios (`:205-206`)
* neighbor assignment: center cell always; left/up (j,k) when the in-cell
  fraction < 0.5 and coord > 1; right/down (l,m) symmetrically (`:211-217`)
* CIoU box loss (masked mean), BCE objectness vs detached clamped IoU with
  per-level balance [4.0, 1.0, 0.4], BCE class with cp/cn smoothing
  (`:127-174`)
* gains box/obj/cls with the train-time rescaling by nl, nc/80 and
  (img/640)^2 applied by the caller (`/root/reference/src/train.py:158-166`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolopoint_tpu.ops.boxes import bbox_iou


@dataclasses.dataclass(frozen=True)
class ObjectLossConfig:
    """Hyperparameters (reference `configs/coco.yaml` `model.yolo.*`)."""

    box: float = 0.05
    obj: float = 1.0
    cls: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    label_smoothing: float = 0.0
    fl_gamma: float = 0.0
    balance: tuple = (4.0, 1.0, 0.4)

    @property
    def cp_cn(self) -> tuple[float, float]:
        eps = self.label_smoothing
        return 1.0 - 0.5 * eps, 0.5 * eps


def _bce_logits(logits, targets, pos_weight=1.0):
    """BCEWithLogits, elementwise (stable log-sum-exp form)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def _focal_factor(logits, targets, gamma, alpha=0.25):
    """TF-style focal modulation (`loss_functions.py:44-54`)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_factor * (1.0 - p_t) ** gamma


def qfocal_factor(logits, targets, gamma=1.5, alpha=0.25):
    """Quality-focal modulation (`QFocalLoss`, `loss_functions.py:64-88`)."""
    p = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_factor * jnp.abs(targets - p) ** gamma


def bce_blur_with_logits(logits, targets, alpha=0.05):
    """BCE with reduced missing-label effects
    (`BCEBlurWithLogitsLoss`, `loss_functions.py:17-31`)."""
    loss = _bce_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    dx = p - targets
    alpha_factor = 1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4))
    return (loss * alpha_factor).mean()


def object_loss(
    preds: Sequence[jax.Array],
    targets: jax.Array,
    target_mask: jax.Array,
    anchors_per_stride: np.ndarray,
    cfg: ObjectLossConfig,
    nc: int,
) -> tuple[jax.Array, dict]:
    """Compute the 3-level YOLOv5 loss.

    Args:
      preds: nl raw Detect tensors `(B, na, ny, nx, nc+5)`.
      targets: `(B, M, 5)` padded `[cls, cx, cy, w, h]`, xywh normalized to
        [0, 1] (the reference's collated `(n, 6)` with the image column
        replaced by padding).
      target_mask: `(B, M)` validity.
      anchors_per_stride: `(nl, na, 2)` static anchors in grid units
        (`Detect.anchors_per_stride()`).
      cfg: hyperparameters (gains already rescaled by caller as in train.py).
      nc: number of classes.

    Returns:
      (total, dict(box=..., obj=..., cls=...)) — total = box+obj+cls like the
      reference return `:174`.
    """
    B, M = targets.shape[:2]
    na = anchors_per_stride.shape[1]
    g = 0.5
    # candidate offsets: center, left, up, right, down (reference off table)
    offs = jnp.array([[0.0, 0.0], [g, 0.0], [0.0, g], [-g, 0.0], [0.0, -g]])
    lbox = jnp.zeros(())
    lobj = jnp.zeros(())
    lcls = jnp.zeros(())
    cp, cn = cfg.cp_cn

    for i, pi in enumerate(preds):
        pi = pi.astype(jnp.float32)
        ny, nx = pi.shape[2], pi.shape[3]
        anchors = jnp.asarray(anchors_per_stride[i], jnp.float32)  # (na, 2)
        gain = jnp.array([nx, ny, nx, ny], jnp.float32)

        txywh = targets[..., 1:5] * gain  # (B, M, 4) grid units
        tcls = targets[..., 0].astype(jnp.int32)  # (B, M)

        # anchor matching: (B, M, na)
        r = txywh[..., None, 2:4] / anchors[None, None]  # (B, M, na, 2)
        ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)
        anchor_ok = ratio < cfg.anchor_t

        # neighbor-offset candidates: (B, M, 5)
        gxy = txywh[..., 0:2]
        gxi = gain[0:2] - gxy
        jk = (jnp.mod(gxy, 1.0) < g) & (gxy > 1.0)  # (B, M, 2) -> left, up
        lm = (jnp.mod(gxi, 1.0) < g) & (gxi > 1.0)  # right, down
        off_ok = jnp.stack(
            [jnp.ones(jk.shape[:2], bool), jk[..., 0], jk[..., 1], lm[..., 0], lm[..., 1]],
            axis=-1,
        )

        # full candidate tensor: (B, M, na, 5)
        valid = target_mask[..., None, None] & anchor_ok[..., None] & off_ok[:, :, None, :]
        # box w/h == 0 padding rows never match anchors, but be explicit:
        valid = valid & (txywh[..., 2:4].min(-1) > 0)[..., None, None]

        gij = jnp.floor(gxy[:, :, None, None, :] - offs[None, None, None])  # (B,M,1,5,2)
        gij = jnp.broadcast_to(gij, (B, M, na, 5, 2))
        gi = jnp.clip(gij[..., 0].astype(jnp.int32), 0, nx - 1)
        gj = jnp.clip(gij[..., 1].astype(jnp.int32), 0, ny - 1)

        # flatten candidates
        K = M * na * 5
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None, None, None], (B, M, na, 5)).reshape(B * K)
        aidx = jnp.broadcast_to(jnp.arange(na)[None, None, :, None], (B, M, na, 5)).reshape(B * K)
        gi_f = gi.reshape(B * K)
        gj_f = gj.reshape(B * K)
        v_f = valid.reshape(B * K)
        cls_f = jnp.broadcast_to(tcls[..., None, None], (B, M, na, 5)).reshape(B * K)
        anc_f = jnp.broadcast_to(anchors[None, None, :, None, :], (B, M, na, 5, 2)).reshape(B * K, 2)
        # target box: xy offset within assigned cell + wh (reference tbox)
        gxy_f = jnp.broadcast_to(gxy[:, :, None, None, :], (B, M, na, 5, 2)).reshape(B * K, 2)
        gwh_f = jnp.broadcast_to(txywh[..., None, None, 2:4], (B, M, na, 5, 2)).reshape(B * K, 2)
        gij_f = jnp.stack([gi_f, gj_f], -1).astype(jnp.float32)
        tbox = jnp.concatenate([gxy_f - gij_f, gwh_f], axis=-1)  # (BK, 4)

        # gather predictions at assigned cells
        psub = pi[bidx, aidx, gj_f, gi_f]  # (BK, nc+5)
        pxy = jax.nn.sigmoid(psub[:, 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(psub[:, 2:4]) * 2.0) ** 2 * anc_f
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, tbox, CIoU=True)  # (BK,)
        vf = v_f.astype(jnp.float32)
        n_valid = vf.sum()
        lbox_i = ((1.0 - iou) * vf).sum() / jnp.maximum(n_valid, 1.0)
        lbox = lbox + jnp.where(n_valid > 0, lbox_i, 0.0)

        # objectness targets: scatter detached IoU into the full grid
        iou_t = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
        tobj = jnp.zeros(pi.shape[:4], jnp.float32)
        drop = jnp.where(v_f, bidx, B)  # out-of-range rows dropped by scatter
        tobj = tobj.at[drop, aidx, gj_f, gi_f].max(iou_t, mode="drop")
        obj_bce = _bce_logits(pi[..., 4], tobj, cfg.obj_pw)
        if cfg.fl_gamma > 0:
            obj_bce = obj_bce * _focal_factor(pi[..., 4], tobj, cfg.fl_gamma)
        lobj = lobj + obj_bce.mean() * cfg.balance[i]

        # classification
        if nc > 1:
            pcls = psub[:, 5:]
            t = jnp.full((B * K, nc), cn, jnp.float32)
            t = t.at[jnp.arange(B * K), cls_f].set(cp)
            cls_bce = _bce_logits(pcls, t, cfg.cls_pw)
            if cfg.fl_gamma > 0:
                cls_bce = cls_bce * _focal_factor(pcls, t, cfg.fl_gamma)
            # reference BCEcls reduction: mean over (n_targets, nc) elements
            lcls_i = (cls_bce * vf[:, None]).sum() / jnp.maximum(n_valid * nc, 1.0)
            lcls = lcls + jnp.where(n_valid > 0, lcls_i, 0.0)

    lbox = lbox * cfg.box
    lobj = lobj * cfg.obj
    lcls = lcls * cfg.cls
    total = lbox + lobj + lcls
    return total, {"box": lbox, "obj": lobj, "cls": lcls}
