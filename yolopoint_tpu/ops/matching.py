"""Mutual nearest-neighbor descriptor matching.

Replaces the reference's numpy `nn_match_two_way`
(`/root/reference/src/demo.py:300-341`,
`/root/reference/src/models/model_wrap.py:434-476`) with a fixed-shape matmul
+ argmin formulation: one MXU matmul and two reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mutual_nearest_neighbor(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array | None = None,
    valid_b: jax.Array | None = None,
    nn_thresh: float = 0.7,
) -> dict[str, jax.Array]:
    """Two-way nearest-neighbor matching of unit descriptors.

    Distance is `sqrt(2 - 2 * a.b)` like the reference; a pair (i, j) matches
    iff j = argmin_j d(i, j), i = argmin_i d(i, j) and d < nn_thresh.

    Args:
      desc_a: `(N, D)` unit descriptors.
      desc_b: `(M, D)` unit descriptors.
      valid_a/valid_b: optional bool masks for padded entries.
      nn_thresh: distance threshold (reference `nn_thresh`, e.g. 0.7).

    Returns:
      dict with `indices` `(N,)` int32 (match in B for each A point),
      `distance` `(N,)`, `valid` `(N,)` bool (mutual + threshold + masks).

    Parity: `/root/reference/src/demo.py:300-341` (`nn_match_two_way`).
    """
    # f32 MXU passes: bf16 similarity error (~1e-2) would corrupt distances
    sim = jnp.matmul(desc_a, desc_b.T, precision=jax.lax.Precision.HIGHEST)
    dmat = jnp.sqrt(jnp.clip(2.0 - 2.0 * jnp.clip(sim, -1.0, 1.0), 0.0))
    big = jnp.asarray(jnp.inf, dmat.dtype)
    if valid_a is not None:
        dmat = jnp.where(valid_a[:, None], dmat, big)
    if valid_b is not None:
        dmat = jnp.where(valid_b[None, :], dmat, big)

    idx_ab = jnp.argmin(dmat, axis=1)  # (N,)
    dist_ab = jnp.min(dmat, axis=1)
    idx_ba = jnp.argmin(dmat, axis=0)  # (M,)

    mutual = idx_ba[idx_ab] == jnp.arange(desc_a.shape[0])
    ok = mutual & (dist_ab < nn_thresh) & jnp.isfinite(dist_ab)
    if valid_a is not None:
        ok = ok & valid_a
    return {
        "indices": idx_ab.astype(jnp.int32),
        "distance": dist_ab,
        "valid": ok,
    }
