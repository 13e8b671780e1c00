"""The jitted, mesh-sharded joint training step.

One XLA program per step (vs. the reference's python-orchestrated double
forward + three losses + DDP backward, `/root/reference/src/train.py:200-252`):

  on-device augmentation (photometric + homographic warped pair)
  -> forward(base) + forward(warped)          [shared params]
  -> detector BCE x2 + YOLOv5 object loss + sparse descriptor loss
  -> total = (det + det_warp) + λ·desc + λ_obj·obj   (train.py:238-241)
  -> grads -> psum over the `data` mesh axis -> optimizer update
  -> BN batch stats pmean'd across replicas.

Parallelism is `shard_map` over a 1-D data mesh: batch sharded, params
replicated, one `psum` per step for grads/metrics — the entire
Accelerate/DDP/NCCL surface of the reference (SURVEY.md §2.8) reduced to two
collectives. BatchNorm stats are per-replica within the step (the reference
trains with `broadcast_buffers=False`, i.e. unsynced BN) but pmean-synced
after the update so checkpoints are replica-independent.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from yolopoint_tpu.data.augmentation import build_training_views
from yolopoint_tpu.losses.descriptor import descriptor_loss_sparse, infonce_loss
from yolopoint_tpu.losses.detector import detector_loss, detector_loss_ce
from yolopoint_tpu.losses.objects import ObjectLossConfig, object_loss
from yolopoint_tpu.ops.heatmap import cell_valid_mask, labels_to_cells
from yolopoint_tpu.parallel.mesh import DATA_AXIS


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """λ weights + sparse-loss sampling config
    (`/root/reference/src/train.py:147-168`, `configs/coco.yaml`)."""

    lambda_desc: float = 0.1       # lambda_loss
    lambda_obj: float = 10.0       # lambda_loss_obj
    joint_training: bool = True
    desc_loss_type: str = "sparse"  # "sparse" | "infonce"
    det_loss_type: str = "bce"     # "bce" (reference parity) | "ce" (MagicPoint-style)
    num_samples_per_image: int = 1000
    num_masked_non_matches_per_match: int = 120


def rescale_yolo_gains(cfg: ObjectLossConfig, nc: int, img_size: int, nl: int = 3) -> ObjectLossConfig:
    """Train-time gain rescaling (`/root/reference/src/train.py:158-166`)."""
    return dataclasses.replace(
        cfg,
        box=cfg.box * 3.0 / nl,
        cls=cfg.cls * nc / 80.0,
        obj=cfg.obj * (img_size / 640.0) ** 2 * 3.0 / nl,
    )


def losses_from_outputs(
    out: Mapping[str, jax.Array],
    out_w: Mapping[str, jax.Array],
    base,
    warped,
    k_desc: jax.Array,
    obj_cfg: ObjectLossConfig,
    weights: LossWeights,
    anchors_per_stride,
    nc: int,
):
    """All joint losses given the two forwards on (base, warped) views.

    `out['objects']` must be the RAW Detect levels. Returns (total, aux dict)
    — the loss blend `(det + det_warp) + λ·desc + λ_obj·obj` of the reference
    train loop (`/root/reference/src/train.py:238-241`).
    """
    # losses always reduce in f32 — the model may run a bf16 conv stack
    f32 = lambda x: x.astype(jnp.float32)

    # keypoint detector losses on both views
    det_fn = detector_loss_ce if weights.det_loss_type == "ce" else detector_loss
    t_base = labels_to_cells(base.labels_2d)
    m_base = cell_valid_mask(base.valid_mask)
    loss_det = det_fn(f32(out["semi"]), t_base, m_base)
    t_warp = labels_to_cells(warped.labels_2d)
    m_warp = cell_valid_mask(warped.valid_mask)
    loss_det_warp = det_fn(f32(out_w["semi"]), t_warp, m_warp)

    # object loss on the base view
    if "objects" in out and weights.lambda_obj > 0:
        loss_obj, obj_items = object_loss(
            [f32(p) for p in out["objects"]], base.boxes, base.box_mask,
            anchors_per_stride, obj_cfg, nc
        )
    else:
        loss_obj = jnp.zeros(())
        obj_items = {"box": loss_obj, "obj": loss_obj, "cls": loss_obj}

    # descriptor loss between views
    if weights.joint_training:
        desc_fn = infonce_loss if weights.desc_loss_type == "infonce" else descriptor_loss_sparse
        loss_desc = desc_fn(
            f32(out["desc"]), f32(out_w["desc"]), warped.valid_mask, warped.inv_homography, k_desc,
            num_samples_per_image=weights.num_samples_per_image,
            num_masked_non_matches_per_match=weights.num_masked_non_matches_per_match,
        )
    else:
        loss_desc = jnp.zeros(())

    total = (loss_det + loss_det_warp) + weights.lambda_desc * loss_desc \
        + weights.lambda_obj * loss_obj
    aux = {
        "loss": total,
        "loss_det": loss_det + loss_det_warp,
        "loss_desc": weights.lambda_desc * loss_desc,
        "loss_obj": weights.lambda_obj * loss_obj,
        **{f"obj_{k}": v for k, v in obj_items.items()},
    }
    return total, aux


def compute_losses(
    model,
    params,
    batch_stats,
    batch: Mapping[str, jax.Array],
    rng: jax.Array,
    aug_config: Mapping[str, Any],
    obj_cfg: ObjectLossConfig,
    weights: LossWeights,
    anchors_per_stride,
    nc: int,
    train: bool = True,
    remat: bool = False,
):
    """Augment + double forward + all losses. Returns (loss, (aux, stats)).

    `remat=True` rematerializes each forward under `jax.checkpoint` —
    activations of the double forward are recomputed in the backward pass,
    trading ~1/3 more FLOPs for the activation memory of one whole view
    (lets 640 px batches grow past HBM on a single chip)."""
    k_aug, k_desc = jax.random.split(rng)
    pre = None
    if "precomputed_h1" in batch:  # host-warp path (data.host_augment)
        pre = {
            "image_base": batch["precomputed_image_base"],
            "valid_base": batch["precomputed_valid_base"],
            "image_pair": batch["precomputed_image_pair"],
            "valid_pair": batch["precomputed_valid_pair"],
            "h1": batch["precomputed_h1"],
            "h2": batch["precomputed_h2"],
        }
    base, warped = build_training_views(
        k_aug,
        batch["image"],
        batch["points"],
        batch["point_mask"],
        batch["boxes"],
        batch["box_mask"],
        aug_config,
        crop_yx=batch.get("mosaic_crop_yx", batch.get("crop_yx")),
        mosaic="mosaic_crop_yx" in batch,
        precomputed=pre,
    )

    mutable = ["batch_stats"] if train else []

    def fwd(p, stats, images):
        variables = {"params": p, "batch_stats": stats}
        if train:
            return model.apply(variables, images, train=True, mutable=mutable)
        return model.apply(variables, images, train=False), {}

    if remat:
        fwd = jax.checkpoint(fwd)

    out, vstate = fwd(params, batch_stats, base.image)
    out_w, vstate2 = fwd(
        params, vstate.get("batch_stats", batch_stats) if train else batch_stats,
        warped.image,
    )
    new_stats = vstate2.get("batch_stats", batch_stats) if train else batch_stats

    total, aux = losses_from_outputs(
        out, out_w, base, warped, k_desc, obj_cfg, weights, anchors_per_stride, nc
    )
    return total, (aux, new_stats)


def make_val_step(
    model,
    aug_config: Mapping[str, Any],
    obj_cfg: ObjectLossConfig,
    weights: LossWeights,
    nc: int,
    kpt_conf: float = 0.015,
    kpt_nms: int = 4,
    kpt_topk: int = 1000,
    box_conf: float = 0.001,
    box_iou: float = 0.6,
    max_det: int = 300,
    max_nms: int = 30000,
):
    """One jitted validation program per batch: augment views, forward both,
    val losses + full device decode (heatmap, keypoint NMS, box NMS,
    descriptor sampling) for BOTH views.

    This replaces the reference's `_validate` device work
    (`/root/reference/src/train.py:309-456`) with a single XLA program; the
    returned homographies link the two decoded views (base -> warped), so
    downstream repeatability/homography metrics use the correct transform —
    the base keypoints come from `base.image`, not the raw batch.
    """
    from yolopoint_tpu.models.detect import Detect
    from yolopoint_tpu.ops.heatmap import cells_to_heatmap
    from yolopoint_tpu.ops.keypoints import extract_keypoints
    from yolopoint_tpu.ops.nms import batched_box_nms
    from yolopoint_tpu.ops.sampling import sample_descriptors

    anchors_ps = None
    if hasattr(model, "anchors") and model.anchors is not None:
        anchors_ps = Detect(nc=nc, anchors=model.anchors).anchors_per_stride()

    def decode(out):
        heat = cells_to_heatmap(out["semi"].astype(jnp.float32))
        pts, scores, valid = extract_keypoints(heat, kpt_conf, kpt_nms, kpt_topk)
        desc = sample_descriptors(out["desc"].astype(jnp.float32), pts)
        result = {"heatmap": heat, "pts": pts, "scores": scores, "valid": valid,
                  "desc": desc}
        if "objects" in out:
            result["det"] = batched_box_nms(
                out["objects"][0].astype(jnp.float32),
                conf_thres=box_conf, iou_thres=box_iou, max_det=max_det,
                # reference val protocol: one candidate per (box, class)
                # (`general_yolo.py:143-147`) at the FULL 30k candidate cap
                # (`general_yolo.py:156-160`) — beyond-dense caps run the
                # exact tiled-scan suppression, no truncation bias
                multi_label=nc > 1,
                max_nms=max_nms,
            )
        return result

    @jax.jit
    def val_step(params, batch_stats, batch, rng):
        k_aug, k_desc = jax.random.split(rng)
        pre = None
        if "precomputed_h1" in batch:  # host-warp path (data.host_augment)
            pre = {
                "image_base": batch["precomputed_image_base"],
                "valid_base": batch["precomputed_valid_base"],
                "image_pair": batch["precomputed_image_pair"],
                "valid_pair": batch["precomputed_valid_pair"],
                "h1": batch["precomputed_h1"],
                "h2": batch["precomputed_h2"],
            }
        base, warped = build_training_views(
            k_aug, batch["image"], batch["points"], batch["point_mask"],
            batch["boxes"], batch["box_mask"], aug_config,
            crop_yx=batch.get("mosaic_crop_yx", batch.get("crop_yx")),
            mosaic="mosaic_crop_yx" in batch,
            precomputed=pre,
        )
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(variables, base.image, train=False, decode=True)
        out_w = model.apply(variables, warped.image, train=False, decode=True)

        raw = dict(out, objects=out["objects"][1]) if "objects" in out else out
        raw_w = dict(out_w, objects=out_w["objects"][1]) if "objects" in out_w else out_w
        _, losses = losses_from_outputs(
            raw, raw_w, base, warped, k_desc, obj_cfg, weights, anchors_ps, nc
        )
        return {
            "losses": losses,
            "base": decode(out),
            "warped": decode(out_w),
            "image": base.image,
            "boxes": base.boxes,
            "box_mask": base.box_mask,
            "labels_2d": base.labels_2d,
            "homography": warped.homography,
            "inv_homography": warped.inv_homography,
        }

    return val_step


def make_train_step(
    model,
    mesh: Mesh,
    aug_config: Mapping[str, Any],
    obj_cfg: ObjectLossConfig,
    weights: LossWeights,
    nc: int,
    donate: bool = True,
    ema_decay: float = 0.9999,
    ema_tau: float = 2000.0,
    remat: bool = False,
    accum: int = 1,
    force_shard_map: bool = False,
):
    """Build the jitted DP train step over `mesh`.

    batch pytree (host side, leading dim = global batch):
      image (B, H, W, C) f32 [0,1]; points (B, N, 2); point_mask (B, N);
      boxes (B, M, 5); box_mask (B, M).
    """
    from yolopoint_tpu.models.detect import Detect

    anchors_ps = None
    # pull static anchor table from the model definition when present
    if hasattr(model, "anchors") and model.anchors is not None:
        anchors_ps = Detect(nc=nc, anchors=model.anchors).anchors_per_stride()

    # single-device mesh: the collectives are identities, and wrapping the
    # step in shard_map costs ~8-40x inside a lax.scan dispatch (measured on
    # v5e: 107 ms/step plain jit vs 4.1 s/step scan-of-shard_map) — compile
    # the plain function and keep rng parity by folding in replica index 0
    use_shard_map = mesh is not None and (mesh.size > 1 or force_shard_map)
    pmean = (lambda t: jax.lax.pmean(t, DATA_AXIS)) if use_shard_map \
        else (lambda t: t)

    def step(state, batch, rng):
        # per-replica rng: fold in the replica index so augmentation differs
        idx = jax.lax.axis_index(DATA_AXIS) if use_shard_map else 0
        rng = jax.random.fold_in(rng, idx)

        def loss_fn(params):
            return compute_losses(
                model, params, state.batch_stats, batch, rng,
                aug_config, obj_cfg, weights, anchors_ps, nc, train=True,
                remat=remat,
            )

        (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = pmean(grads)
        aux = pmean(aux)
        new_stats = pmean(new_stats)
        # non-finite-update guard: if any gradient / loss / BN-stat leaf is
        # non-finite (one pathological batch), the WHOLE state update
        # (params, opt state, BN stats, EMA) is reverted below — the
        # TPU-native analog of the reference's torch.amp GradScaler step
        # skip (`/root/reference/src/train.py` scaler.step; GradScaler skips
        # the optimizer step on inf/nan grads). After pmean every replica
        # sees the same values, so the decision is replica-consistent.
        finite = jnp.isfinite(pmean(loss))
        for leaf in jax.tree_util.tree_leaves((grads, new_stats)):
            finite &= jnp.all(jnp.isfinite(leaf))
        new_state = state.apply_gradients(grads=grads, new_batch_stats=new_stats)
        if state.ema_params is not None:  # static: EMA enabled at state creation
            from yolopoint_tpu.training.ema import ema_update

            # EMA tracks OPTIMIZER updates, not micro-batches: under gradient
            # accumulation MultiSteps applies the inner transform on every
            # `accum`-th call, so the decay ramp counts `step // accum` and
            # non-update micro-steps leave the shadow untouched (reference
            # `ModelEMA.update` counts optimizer updates,
            # `/root/reference/src/utils/torch_utils_yolo.py:326-334`)
            updated = ema_update(
                new_state.ema_params, new_state.params, new_state.step // accum,
                decay=ema_decay, tau=ema_tau,
            )
            if accum > 1:
                is_opt_step = (new_state.step % accum) == 0
                updated = jax.tree_util.tree_map(
                    lambda u, e: jnp.where(is_opt_step, u, e),
                    updated, new_state.ema_params,
                )
            new_state = new_state.replace(ema_params=updated)
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_state, state
        )
        aux = dict(aux)
        aux["nonfinite_skip"] = 1.0 - finite.astype(jnp.float32)
        return new_state, aux

    if not use_shard_map:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    state_spec = P()  # replicated
    batch_spec = P(DATA_AXIS)
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_multi_step(step_fn, scan_steps: int):
    """Wrap a train step into ONE jitted program running `scan_steps`
    optimizer steps over a stacked batch (leading dim = step).

    Dispatch overhead (host -> device program launch, argument traffic) is
    paid once per `scan_steps` steps — the XLA-idiomatic train loop shape.
    Pair with the loader's host-warp path: the host prepares K batches while
    the device runs the previous K steps.

    Args:
      step_fn: result of `make_train_step` (donate=False recommended — the
        scan carries the state internally).
      scan_steps: K.

    Returns:
      jitted `(state, stacked_batch, rng) -> (state, aux)` where every leaf
      of `stacked_batch` has a leading K dim and `aux` holds per-step
      scalars stacked along the leading dim.
    """

    @jax.jit
    def multi(state, stacked_batch, rng):
        def one(st, inp):
            i, batch = inp
            st, aux = step_fn(st, batch, jax.random.fold_in(rng, i))
            return st, aux

        return jax.lax.scan(
            one, state, (jnp.arange(scan_steps), stacked_batch)
        )

    return multi


def make_device_multi_step(step_fn, scan_steps: int):
    """Scan `scan_steps` optimizer steps in ONE dispatch, gathering each
    step's batch INSIDE the scan from HBM-resident dataset arrays
    (`data.device_data.DeviceDataLoader.resident_data`).

    Per-dispatch host->device traffic is a `(K, B)` int32 index array — on a
    tunneled TPU this collapses the per-step dispatch round-trip (measured
    ~0.3 s/step wall vs ~40 ms device time on the v5e tunnel) into one
    launch per K steps. The reference has no analog (torch DataLoader feeds
    every step over PCIe); this is the TPU-idiomatic train-loop shape:
    device-resident data + `lax.scan` over jitted steps.

    Args:
      step_fn: result of `make_train_step` (donate=False — the scan carries
        state internally; the OUTER state argument is donated here).
      scan_steps: K.

    Returns:
      jitted `(state, data, idx, rng) -> (state, aux)`; `idx` is `(K, B)`
      int32 rows into the resident arrays, `aux` leaves are stacked `(K,)`.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, data, idx, rng):
        def one(st, inp):
            i, row = inp
            batch = {k: v[row] for k, v in data.items()}
            st, aux = step_fn(st, batch, jax.random.fold_in(rng, i))
            return st, aux

        return jax.lax.scan(one, state, (jnp.arange(scan_steps), idx))

    return multi


def stack_batches(batches) -> dict:
    """Stack a list of same-shape batch dicts along a new leading dim."""
    import numpy as np

    keys = batches[0].keys()
    return {k: np.stack([b[k] for b in batches]) for k in keys}
