"""Descriptor losses: sparse contrastive (default), InfoNCE, dense hinge.

Re-designs of `/root/reference/src/utils/loss_functions.py:237-597` with the
ragged machinery removed (SURVEY.md §7 "hard parts"):

* The reference builds per-image variable-length match pools
  (`match_pool_size = min over batch`, `:409-410`) by boolean filtering — a
  dynamic shape. Here every image contributes a FIXED `num_samples` of cell
  coords sampled uniformly; samples falling outside the warped-valid region
  get zero weight instead of being dropped. Expectations match; shapes are
  static.
* Negatives are `num_neg` random *valid* samples per match drawn from the
  whole batch pool with accidental-positive masking, like `:448-473`.
* All descriptor gathers are bilinear `grid_sample` with align_corners
  semantics (`:430-434`), differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolopoint_tpu.ops.geometry import homography_scaling, warp_image, warp_points
from yolopoint_tpu.ops.heatmap import cell_valid_mask
from yolopoint_tpu.ops.sampling import grid_sample


def _sample_cell_coords(key, batch: int, hc: int, wc: int, num_samples: int):
    """Uniformly sample integer cell coords (x, y) per image."""
    kx, ky = jax.random.split(key)
    xs = jax.random.randint(kx, (batch, num_samples), 0, wc)
    ys = jax.random.randint(ky, (batch, num_samples), 0, hc)
    return jnp.stack([xs, ys], axis=-1).astype(jnp.float32)


def _bilinear_desc(desc: jax.Array, coords_cell: jax.Array) -> jax.Array:
    """Sample (B, Hc, Wc, D) maps at cell coords (B, N, 2); no renorm
    (matches the reference's raw grid_sample in the loss, `:430-434`)."""
    B, Hc, Wc, D = desc.shape
    # cell coords ARE the coarse-map pixel coords; the reference normalizes
    # with (Wc, Hc) then grid_samples align_corners=True over (Wc, Hc):
    # x_map = ((x/Wc*2-1)+1)/2*(Wc-1) = x*(Wc-1)/Wc — reproduce exactly.
    sx = coords_cell[..., 0] * (Wc - 1) / Wc
    sy = coords_cell[..., 1] * (Hc - 1) / Hc
    return grid_sample(desc, jnp.stack([sx, sy], axis=-1))


def _matched_coords(
    key,
    desc_shape,
    valid_mask_warp: jax.Array,
    inv_homographies: jax.Array,
    num_samples: int,
    cell_size: int,
):
    """Common sampling machinery for sparse/infonce losses.

    Returns (uv_a (B,N,2) cell coords, uv_b (B,N,2) matched warped cell
    coords (rounded like the reference `:391`), weight (B,N) in {0,1}).
    """
    B, Hc, Wc, _ = desc_shape
    # inverse-warp the warped-frame valid mask into the base frame at CELL
    # resolution: pool to cells first (all-pixels-valid product), then warp
    # the (Hc, Wc) cell mask. The reference warps the full-res mask and then
    # pools (`:384-387`) — full-res warps are per-pixel gathers (~0.9 s per
    # step at B=32/640px on TPU) and the two orders differ only on cells
    # clipped by the warp boundary, which merely reweights a few samples.
    m_cells_w = cell_valid_mask(valid_mask_warp, cell_size)      # (B, Hc, Wc)
    # normalized-coords homographies are resolution-independent: warp the
    # cell-resolution mask directly
    m_cells = warp_image(
        m_cells_w[..., None], inv_homographies, mode="nearest"
    )[..., 0]

    uv_a = _sample_cell_coords(key, B, Hc, Wc, num_samples)  # (B, N, 2)
    # weight by cell validity at the sampled location
    ax = uv_a[..., 0].astype(jnp.int32)
    ay = uv_a[..., 1].astype(jnp.int32)
    w = jax.vmap(lambda mc, x, y: mc[y, x])(m_cells, ax, ay)  # (B, N)

    Hpix = jax.vmap(lambda h: homography_scaling(h, Hc, Wc))(inv_homographies)
    uv_b = jax.vmap(warp_points)(uv_a, Hpix)
    uv_b = jnp.round(uv_b)
    # matches warped outside the coarse map are invalid
    inside = (
        (uv_b[..., 0] >= 0) & (uv_b[..., 0] <= Wc - 1)
        & (uv_b[..., 1] >= 0) & (uv_b[..., 1] <= Hc - 1)
    )
    w = w * inside.astype(w.dtype)
    return uv_a, uv_b, w


def descriptor_loss_sparse(
    descriptors: jax.Array,
    descriptors_warped: jax.Array,
    valid_mask_warp: jax.Array,
    inv_homographies: jax.Array,
    key: jax.Array,
    num_samples_per_image: int = 1500,
    num_masked_non_matches_per_match: int = 120,
    cell_size: int = 8,
) -> jax.Array:
    """Pixel-wise contrastive descriptor loss (the reference default).

    positives: hinge `clamp(1 - d·d+)` masked mean;
    negatives: hinge `clamp(d·d- - 0.1)` summed over random negatives and
    normalized by the hard-negative count (+1), like `:441-478`.

    Args:
      descriptors / descriptors_warped: `(B, Hc, Wc, D)` unit maps (NHWC).
      valid_mask_warp: `(B, H, W)` full-res warped valid mask.
      inv_homographies: `(B, 3, 3)` normalized-coords inverse homographies.
      key: PRNG key (replaces np.random state in the reference).
    """
    B, Hc, Wc, D = descriptors.shape
    k_coords, k_neg = jax.random.split(key)
    uv_a, uv_b, w = _matched_coords(
        k_coords, descriptors.shape, valid_mask_warp, inv_homographies,
        num_samples_per_image, cell_size,
    )

    d_a = _bilinear_desc(descriptors, uv_a)          # (B, N, D) query
    d_b = _bilinear_desc(descriptors_warped, uv_b)   # (B, N, D) positives

    pos_prod = (d_a * d_b).sum(-1)                   # (B, N)
    w_flat = w.reshape(-1)
    pos_hinge = jnp.clip(1.0 - pos_prod.reshape(-1), 0.0) * w_flat
    match_loss = pos_hinge.sum() / jnp.maximum(w_flat.sum(), 1.0)

    N = B * num_samples_per_image
    Kneg = num_masked_non_matches_per_match
    neg_prod, pair_w, _ = _group_negative_products(
        k_neg, d_a.reshape(N, D), d_b.reshape(N, D), w_flat, Kneg
    )
    neg_hinge = jnp.clip(neg_prod - 0.1, 0.0) * pair_w
    num_hard = jnp.count_nonzero(neg_hinge).astype(jnp.float32)
    neg_loss = neg_hinge.sum() / (num_hard + 1.0)

    return match_loss + neg_loss


def _group_negative_products(
    k_neg,
    d_a_flat: jax.Array,
    d_b_flat: jax.Array,
    w_flat: jax.Array,
    num_neg: int,
    group: int = 128,
):
    """Negative dot products with negatives shared per query GROUP.

    Per-query iid negatives (`d_b_flat[rand_idx]` with a `(K, N)` index
    matrix) force XLA into millions of row point-gathers whose backward is a
    giant serial scatter-add — seconds per step on TPU at training sizes.
    Sharing one negative set across each group of `group` queries keeps the
    same uniform marginal distribution (negatives merely correlate within a
    group — standard shared-negative contrastive practice) and turns the
    whole thing into `(group, D) @ (D, K)` MXU matmuls with only
    `N/group * K` row gathers.

    Returns (neg_prod `(Npad, K)`, pair_w `(Npad, K)` with self-pairs and
    invalid pairs zeroed, padded query weights `(Npad,)`), Npad = N rounded
    up to `group`.
    """
    N, D = d_a_flat.shape
    Npad = -(-N // group) * group
    pad = Npad - N
    w_q = jnp.pad(w_flat, (0, pad)) if pad else w_flat
    if pad:
        d_a_flat = jnp.pad(d_a_flat, ((0, pad), (0, 0)))
    G = Npad // group
    idx = jax.random.randint(k_neg, (G, num_neg), 0, N)          # (G, K)
    d_neg = d_b_flat[idx]                                        # (G, K, D)
    neg_prod = jnp.einsum(
        "gsd,gkd->gsk", d_a_flat.reshape(G, group, D), d_neg,
        precision=jax.lax.Precision.HIGHEST,
    )
    q_idx = jnp.arange(Npad).reshape(G, group, 1)
    self_pair = idx[:, None, :] == q_idx                         # (G, group, K)
    pair_w = (
        w_q.reshape(G, group, 1)
        * w_flat[idx][:, None, :]
        * (~self_pair).astype(w_flat.dtype)
    )
    return (
        neg_prod.reshape(Npad, num_neg),
        pair_w.reshape(Npad, num_neg),
        w_q,
    )


def infonce_loss(
    descriptors: jax.Array,
    descriptors_warped: jax.Array,
    valid_mask_warp: jax.Array,
    inv_homographies: jax.Array,
    key: jax.Array,
    num_samples_per_image: int = 1500,
    num_masked_non_matches_per_match: int = 120,
    cell_size: int = 8,
    tau: float = 0.07,
) -> jax.Array:
    """InfoNCE over [positive, negatives] logits with temperature tau
    (`infonce`, `/root/reference/src/utils/loss_functions.py:484-597` — used
    by the "experimental" published weights)."""
    B, Hc, Wc, D = descriptors.shape
    k_coords, k_neg = jax.random.split(key)
    uv_a, uv_b, w = _matched_coords(
        k_coords, descriptors.shape, valid_mask_warp, inv_homographies,
        num_samples_per_image, cell_size,
    )
    d_a = _bilinear_desc(descriptors, uv_a)
    d_b = _bilinear_desc(descriptors_warped, uv_b)

    N = B * num_samples_per_image
    Kneg = num_masked_non_matches_per_match
    d_a_flat = d_a.reshape(N, D)
    d_b_flat = d_b.reshape(N, D)
    w_flat = w.reshape(N)

    pos = (d_a_flat * d_b_flat).sum(-1)                 # (N,)
    neg_prod, pair_w, w_q = _group_negative_products(
        k_neg, d_a_flat, d_b_flat, w_flat, Kneg
    )
    Npad = neg_prod.shape[0]
    pos_pad = jnp.pad(pos, (0, Npad - N)) if Npad > N else pos
    # self-pairs / invalid pairs must not act as negatives: -inf them out of
    # the softmax (the reference re-rolls colliding indices, `:528-532`)
    neg_masked = jnp.where(pair_w > 0.0, neg_prod, -1e9)
    logits = jnp.concatenate([pos_pad[:, None], neg_masked], axis=1) / tau
    logp = jax.nn.log_softmax(logits, axis=1)[:, 0]
    return -(logp * w_q).sum() / jnp.maximum(w_flat.sum(), 1.0)


def descriptor_loss_dense(
    descriptors: jax.Array,
    descriptors_warped: jax.Array,
    homographies: jax.Array,
    valid_mask: jax.Array | None = None,
    cell_size: int = 8,
    lambda_d: float = 0.05,
    margin_pos: float = 1.0,
    margin_neg: float = 0.2,
) -> jax.Array:
    """SuperPoint dense hinge loss over all cell pairs
    (`descriptor_loss_dense`, `/root/reference/src/utils/loss_functions.py:237-336`).

    s-mask: cell centers whose warped distance <= cell_size - 0.5.
    O((Hc*Wc)^2) per image — available for small maps / ablations; the sparse
    loss is the training default.
    """
    B, Hc, Wc, D = descriptors.shape
    H, W = Hc * cell_size, Wc * cell_size

    # cell centers in pixel coords (y, x ordering mirrors the reference math)
    cx = (jax.lax.broadcasted_iota(jnp.float32, (Hc, Wc), 1)) * cell_size + cell_size // 2
    cy = (jax.lax.broadcasted_iota(jnp.float32, (Hc, Wc), 0)) * cell_size + cell_size // 2
    centers = jnp.stack([cx, cy], -1).reshape(-1, 2)  # (Hc*Wc, 2) x,y

    # warp centers by the homography in pixel coords
    Hpix = jax.vmap(lambda h: homography_scaling(h, H, W))(jnp.atleast_3d(homographies).reshape(-1, 3, 3))
    warped = jax.vmap(lambda h: warp_points(centers, h))(Hpix)  # (B, Hc*Wc, 2)

    # s[b, n, m] pairs base cell n (via its warped center) with cell m of the
    # other view — axis order matches the descriptor dot below (reference
    # layout: base cells on dims 1-2, warped cells on dims 3-4)
    dist = jnp.linalg.norm(
        warped[:, :, None, :] - centers[None, None, :, :], axis=-1
    )  # (B, n_base, m_warped)
    s = (dist <= cell_size - 0.5).astype(jnp.float32)

    da = descriptors.reshape(B, Hc * Wc, D)
    db = descriptors_warped.reshape(B, Hc * Wc, D)
    dot = jnp.einsum("bnd,bmd->bnm", da, db, precision=jax.lax.Precision.HIGHEST)

    pos = jnp.clip(margin_pos - dot, 0.0)
    neg = jnp.clip(dot - margin_neg, 0.0)
    loss = lambda_d * s * pos + (1.0 - s) * neg

    if valid_mask is None:
        mask = jnp.ones((B, Hc * Wc), jnp.float32)
    else:
        mask = cell_valid_mask(valid_mask, cell_size).reshape(B, Hc * Wc)
    # the reference applies the valid mask along the second (dims 3-4) cell
    # axis and squares it in the normalized sum (binary mask: mask^2 == mask)
    loss = loss * mask[:, None, :]
    normalization = mask.sum() * Hc * Wc
    return loss.sum() / jnp.maximum(normalization, 1.0)
