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
    p = jax.nn.softmax(semi_logits.astype(jnp.float32), axis=-1)
    eps = 1e-12  # torch BCELoss clamps log at -100; epsilon keeps grads finite
    bce = -(target_cells * jnp.log(p + eps) + (1.0 - target_cells) * jnp.log(1.0 - p + eps))
    per_cell = bce.sum(axis=-1) * cell_mask
    return per_cell.sum() / (cell_mask.sum() + 1e-10)
