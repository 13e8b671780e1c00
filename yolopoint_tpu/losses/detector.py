"""Keypoint detector (semi) loss.

Parity: `ComputeDetectorLoss` `/root/reference/src/utils/loss_functions.py:600-619`:
channel softmax -> elementwise BCE vs dustbin-normalized cell targets ->
channel sum -> valid-cell masking -> normalize by mask sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def detector_loss(semi_logits: jax.Array, target_cells: jax.Array, cell_mask: jax.Array) -> jax.Array:
    """BCE between softmaxed 65-ch logits and soft cell targets.

    Args:
      semi_logits: `(B, Hc, Wc, 65)` raw detector-head output (NHWC).
      target_cells: `(B, Hc, Wc, 65)` from `labels_to_cells` (sums to 1).
      cell_mask: `(B, Hc, Wc)` valid-cell mask from `cell_valid_mask`.

    Returns:
      scalar loss.
    """
    # clip: TPU f32 division is reciprocal-approximation based (not
    # correctly rounded), so softmax can return p = 1 + 1ulp for saturated
    # cells -> 1 - p + eps goes NEGATIVE -> log() = NaN. Observed in real
    # training the moment the detector became confident (loss_det NaN at
    # epoch 2 while the identical inputs were finite on CPU).
    p = jnp.clip(jax.nn.softmax(semi_logits.astype(jnp.float32), axis=-1), 0.0, 1.0)
    # eps 1e-7 ~ f32 ulp at 1.0: bounds per-element |log| by ~16 and grads by
    # ~1e7 — the same effective ceiling torch BCELoss has (p saturates at
    # 1 - 6e-8 in f32; its log clamp at -100 essentially never binds)
    eps = 1e-7
    bce = -(target_cells * jnp.log(p + eps) + (1.0 - target_cells) * jnp.log(1.0 - p + eps))
    per_cell = bce.sum(axis=-1) * cell_mask
    return per_cell.sum() / (cell_mask.sum() + 1e-10)


def detector_loss_ce(semi_logits: jax.Array, target_cells: jax.Array, cell_mask: jax.Array) -> jax.Array:
    """Per-cell softmax cross-entropy vs the soft (dustbin-normalized) cell
    targets — the original SuperPoint/MagicPoint detector objective.

    The reference fine-tunes with BCE-after-softmax (`detector_loss` above,
    `/root/reference/src/utils/loss_functions.py:600-619`) starting from
    pseudo-labels; when training FROM SCRATCH on synthetic shapes that
    objective saturates toward dustbin-everywhere (observed: |logits| -> 60
    within 2 epochs, repeatability collapsing to 0). CE's gradient is
    `p - t` per channel — bounded, never saturating for confidently-wrong
    cells — and is what the SuperPoint paper's MagicPoint stage trains with.
    Selected via `model.superpoint.det_loss: ce`.

    Same signature/reduction as `detector_loss`.
    """
    logp = jax.nn.log_softmax(semi_logits.astype(jnp.float32), axis=-1)
    per_cell = -(target_cells * logp).sum(axis=-1) * cell_mask
    return per_cell.sum() / (cell_mask.sum() + 1e-10)
