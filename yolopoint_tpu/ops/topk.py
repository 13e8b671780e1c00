"""Exact top-k tuned for the TPU decode paths.

`jax.lax.top_k` lowers to a full variadic sort on TPU — O(N log N) and,
worse, data-dependent in wall time: on the serving confidence plane (mostly
`-1.0` sentinel after the conf gate, a few hundred positives) the sort costs
70.7 ms/batch at (128, 25200) where the dense-uniform case costs 4.9 ms
(tools/profile_topk_opts.py). `jax.lax.approx_max_k` lowers to the O(N)
PartialReduce TPU op instead; at `recall_target=1.0` the partition sizing
guarantees the exact top-k set, and the final `aggregate_to_topk` pass
returns it sorted descending — measured 4.5 ms sparse / 4.0 ms dense at the
same shape, values bit-identical to `top_k`.

Order caveat: among EQUAL values, `top_k` returns the lowest index first
while PartialReduce's tie order is unspecified. Every call site here uses
the result as a score-descending priority order where ties are either
sentinel (invalid, masked downstream) or equal-confidence candidates whose
mutual order the reference protocol does not pin down either
(`/root/reference/src/utils/general_yolo.py:156-160` sorts by conf with
torch's unstable sort).

int32 inputs (the packed NMS score/position keys, ops/pallas_nms.py) ride
the float pipeline through a bitcast: for NON-NEGATIVE int32 the IEEE-754
float32 view is monotone in the integer value. Raw bitcasting is NOT enough
on TPU though: integers below 0x0080_0000 view as DENORMAL floats, which
the VPU flushes to zero, collapsing their order (observed on-chip: the
value set comes back wrong for synthetic sub-2^23 keys). Adding a
0x3F80_0000 bias first maps any key in [0, 0x4000_0000) into the normal
positive range [1.0f, ~3.4e38) — still strictly monotone, no NaN/Inf/
denormal bit patterns — and is subtracted back after the reduction. The
packed keys (zero, or a bitcast score in [conf_thresh, 1] with low mantissa
bits replaced) stay well below the 0x4000_0000 limit.

On CPU (tests) `approx_max_k` falls back to an exact sort-based top-k, so
results are platform-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_top_k(
    x: jax.Array, k: int, two_stage: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Drop-in `lax.top_k` replacement: exact values, sorted descending.

    Args:
      x: `(..., N)` float array, or NON-NEGATIVE int32 whose values stay
        below `0x4000_0000` — after the +0x3F80_0000 denormal-avoidance
        bias, values at or above that bound view as negative floats /
        NaN-space and silently corrupt the ordering (see module docstring;
        the packed keypoint keys stay well inside the bound).
      k: number of results, `k <= N`.
      two_stage: run PartialReduce with `aggregate_to_topk=False` (an
        unsorted l >= k candidate superset) and finish with a small dense
        `lax.top_k` over the l columns, instead of the built-in
        aggregation sort over the same candidates. Same exact result;
        cheaper when the aggregation dominates (profile with
        `python tools/profile.py topk-stage2`).

    Returns:
      `(values, indices)`, each `(..., k)`, values sorted descending. Equal
      to `lax.top_k(x, k)` except for index tie-breaking among equal values.
    """
    def _reduce(xf):
        if not two_stage:
            return jax.lax.approx_max_k(xf, k, recall_target=1.0)
        v, i = jax.lax.approx_max_k(xf, k, recall_target=1.0,
                                    aggregate_to_topk=False)
        sv, si = jax.lax.top_k(v, k)
        return sv, jnp.take_along_axis(i, si, axis=-1)

    if jnp.issubdtype(x.dtype, jnp.integer):
        assert x.dtype == jnp.int32, x.dtype
        # bias into the normal-float range: denormal views (< 0x00800000)
        # are flushed to zero by the TPU VPU and lose their ordering
        bias = jnp.int32(0x3F800000)
        xf = jax.lax.bitcast_convert_type(x + bias, jnp.float32)
        v, i = _reduce(xf)
        return jax.lax.bitcast_convert_type(v, jnp.int32) - bias, i
    return _reduce(x)
