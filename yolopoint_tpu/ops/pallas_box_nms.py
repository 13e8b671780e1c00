"""Pallas TPU kernel: greedy box-NMS suppression entirely in VMEM.

The XLA formulation (`ops.nms._greedy_nms_keep`) materializes a `(B, K, K)`
f32 IoU matrix in HBM and re-reads the `(K, K)` overlap mask on every Jacobi
iteration of the greedy fixpoint — with adversarial candidate sets the
data-dependent iteration count makes it the decode hot spot (~10 ms at
B=128, K=1024). Per image, everything fits on-chip: boxes are 16 KB, the
overlap matrix is 1-2 MB. This kernel computes the pairwise-IoU overlap
matrix blockwise in VMEM and runs the fixpoint as a sequence of
`(K, K) @ (K, 1)` mat-vecs on the MXU (a kept earlier box suppresses a later
one iff the 0/1 mat-vec count is nonzero), touching HBM only for the
`(K, 4)` boxes in and the `(K,)` keep mask out.

Replaces the suppression core of the reference's `torchvision.ops.nms`
(`/root/reference/src/utils/general_yolo.py:218`) with identical greedy
semantics (same result as `_greedy_nms_keep`; exactness argument in that
docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(br_ref, bc_ref, vc_ref, out_ref, m_ref, *, K, BK, iou_thres):
    """One image per program.

    br_ref: (K, 4) boxes row-wise; bc_ref: (4, K) boxes column-wise;
    vc_ref: (1, K) validity; out_ref: (1, K) keep mask (f32 0/1);
    m_ref: (K, K) bf16 scratch — M[a, b] = 1 iff earlier box b (b < a)
    overlaps later box a above the IoU threshold (both valid).
    """
    nblk = K // BK

    def build_block(rb, _):
        r0 = rb * BK
        sl = pl.ds(r0, BK)
        x1r, y1r = br_ref[sl, 0:1], br_ref[sl, 1:2]          # (BK, 1)
        x2r, y2r = br_ref[sl, 2:3], br_ref[sl, 3:4]
        x1c, y1c = bc_ref[0:1, :], bc_ref[1:2, :]            # (1, K)
        x2c, y2c = bc_ref[2:3, :], bc_ref[3:4, :]
        iw = jnp.maximum(jnp.minimum(x2r, x2c) - jnp.maximum(x1r, x1c), 0.0)
        ih = jnp.maximum(jnp.minimum(y2r, y2c) - jnp.maximum(y1r, y1c), 0.0)
        inter = iw * ih                                       # (BK, K)
        area_r = (x2r - x1r) * (y2r - y1r)
        area_c = (x2c - x1c) * (y2c - y1c)
        iou = inter / (area_r + area_c - inter + 1e-9)
        rows = jax.lax.broadcasted_iota(jnp.int32, (BK, K), 0) + r0
        cols = jax.lax.broadcasted_iota(jnp.int32, (BK, K), 1)
        # row b suppresses strictly LATER columns a (b < a)
        m = (iou > iou_thres) & (rows < cols) & (vc_ref[0:1, :] > 0.0)
        m_ref[sl, :] = m.astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, nblk, build_block, 0, unroll=True)

    # Greedy fixpoint, block Gauss-Seidel: suppression only flows from
    # earlier (higher-score) to later boxes, so finalize 128-box column
    # blocks left to right — one (1,K)@(K,128) MXU vec-mat imports the
    # finalized earlier blocks' suppression, then a small Jacobi fixpoint
    # on the (128,128) diagonal block resolves within-block chains (exact
    # greedy; converges in within-block chain depth, see
    # ops.nms._greedy_nms_keep). Row-vector layout throughout — Mosaic has
    # no lane-broadcast for (K,1) operands.
    BB = 256
    nbb = K // BB

    def vecmat(row, mat):
        return jax.lax.dot_general(
            row.astype(jnp.bfloat16), mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[:, :] = jnp.zeros((1, K), jnp.float32)

    def block_step(cb, _):
        c0 = pl.multiple_of(cb * BB, BB)
        base = vecmat(out_ref[:, :], m_ref[:, pl.ds(c0, BB)])    # (1, BB)
        valid_blk = vc_ref[0:1, pl.ds(c0, BB)]
        mblk = m_ref[pl.ds(c0, BB), pl.ds(c0, BB)]               # (BB, BB)
        free = (base == 0.0) & (valid_blk > 0.0)
        kb0 = jnp.where(free, 1.0, 0.0)

        def cond(carry):
            kb, prev, it = carry
            return jnp.logical_and(it < BB, jnp.sum(jnp.abs(kb - prev)) > 0.0)

        def body(carry):
            kb, _, it = carry
            s = vecmat(kb, mblk)                                 # (1, BB)
            return jnp.where(free & (s == 0.0), 1.0, 0.0), kb, it + 1

        kb, _, _ = jax.lax.while_loop(
            cond, body, (kb0, jnp.full_like(kb0, -1.0), jnp.int32(0))
        )
        out_ref[:, pl.ds(c0, BB)] = kb
        return 0

    jax.lax.fori_loop(0, nbb, block_step, 0)


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def pallas_greedy_nms(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thres: float,
    interpret: bool = False,
) -> jax.Array:
    """Greedy NMS keep mask on score-sorted boxes, one program per image.

    Args:
      boxes: `(B, K, 4)` xyxy (class-offset already applied), score-DESC
        sorted; K must be a multiple of 256.
      valid: `(B, K)` bool.

    Returns:
      `(B, K)` bool keep mask — identical to `_greedy_nms_keep` vmapped.
    """
    B, K, _ = boxes.shape
    BK = 256
    assert K % BK == 0, "pad candidates to a multiple of 256"
    br = boxes.astype(jnp.float32)
    bc = jnp.swapaxes(br, 1, 2)                                  # (B, 4, K)
    vc = valid.astype(jnp.float32)[:, None, :]                   # (B, 1, K)
    kernel = functools.partial(_kernel, K=K, BK=BK, iou_thres=float(iou_thres))
    keep = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, K, 4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, K), jnp.bfloat16)],
        interpret=interpret,
    )(br, bc, vc)
    return keep[:, 0, :] > 0.0
