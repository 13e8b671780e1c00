"""Train state: params + BN stats + optax optimizer, schedules, freezing.

Replaces the reference's torch Adam + LambdaLR + layer freezing + shrink-
perturb warm start (`/root/reference/src/train.py:88-115,598-604`,
`freeze_layers` `/root/reference/src/models/YOLOPoint.py:137-145`) with optax:
* linear lr decay 1 -> lrf over epochs (`src/train.py:91-93`)
* grad-norm clipping (`:249-250`)
* gradient accumulation via `optax.MultiSteps` (Accelerate's accumulate,
  `:38-43,190`)
* freezing via `optax.masked` zero-updates (index-slice spec
  `parse_str_slice`-compatible)
* shrink-perturb: θ <- λθ + N(0, σ) on weight tensors.
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_params: Any = None  # EMA shadow weights (None = EMA disabled)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def parse_str_slice(spec: str) -> list[int]:
    """`'0-62, 100'` -> [0..62, 100] (reference `parse_str_slice`,
    `/root/reference/src/utils/utils.py:22-27`)."""
    out: list[int] = []
    for part in spec.replace(" ", "").split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        elif part:
            out.append(int(part))
    return out


def freeze_mask_from_indices(params, frozen_indices: Sequence[int]):
    """Boolean pytree: True = trainable. Parameters are enumerated in pytree
    order (the reference freezes by `named_parameters()` index,
    `YOLOPoint.py:137-145`)."""
    frozen = set(frozen_indices)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    flags = [i not in frozen for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, flags)


# --- reference-order parameter enumeration -------------------------------
#
# The reference freezes by `named_parameters()` index (torch declaration
# order); published configs document index ranges like '0-62' = shared
# backbone (`/root/reference/configs/kitti.yaml:168-173`). Flax dicts are
# alphabetical, so to keep those specs reusable we enumerate leaves in the
# torch traversal order: top-level modules in declaration order
# (`models.yolopoint.REFERENCE_MODULE_ORDER`), children natural-sorted
# except `conv` before `bn` (torch declares the conv first), leaves in
# torch's weight-then-bias order (kernel -> scale -> bias).

_LEAF_ORDER = {"kernel": 0, "scale": 1, "bias": 2}


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def _child_sort_key(name: str, is_leaf: bool):
    if is_leaf:
        return (0, _LEAF_ORDER.get(name, 9), _natural_key(name))
    if name == "conv":
        return (1, 0, [])
    if name == "bn":
        return (1, 1, [])
    return (2, 0, _natural_key(name))


def iter_params_reference_order(params: Mapping, module_order: Optional[Sequence[str]] = None):
    """Yield (path, leaf) pairs in the reference `named_parameters()` order."""

    def walk(node, path):
        if not isinstance(node, Mapping):
            yield tuple(path), node
            return
        names = sorted(node.keys(),
                       key=lambda k: _child_sort_key(k, not isinstance(node[k], Mapping)))
        for name in names:
            yield from walk(node[name], path + [name])

    top = list(params.keys())
    if module_order:
        known = [m for m in module_order if m in params]
        rest = sorted((m for m in top if m not in set(module_order)), key=_natural_key)
        top = known + rest
    else:
        top = sorted(top, key=_natural_key)
    for name in top:
        yield from walk(params[name], [name])


def freeze_mask_from_spec(
    params: Mapping,
    spec: str,
    module_order: Optional[Sequence[str]] = None,
):
    """`freeze_layers: '0-62'` -> boolean pytree (True = trainable), indices
    counted in the reference `named_parameters()` order (`iter_params_
    reference_order`). Parity: `Model.freeze_layers`
    `/root/reference/src/models/YOLOPoint.py:137-145` +
    `parse_str_slice` `/root/reference/src/utils/utils.py:22-27`."""
    frozen = set(parse_str_slice(spec))
    mask: dict = {}
    for i, (path, _) in enumerate(iter_params_reference_order(params, module_order)):
        node = mask
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = i not in frozen
    return mask


def linear_lr_schedule(base_lr: float, lrf: float, total_epochs: int, steps_per_epoch: int):
    """lr(e) = base * (1 - e/E * (1 - lrf)) stepped per epoch
    (`/root/reference/src/train.py:91-93`)."""

    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), total_epochs)
        frac = epoch.astype(jnp.float32) / max(total_epochs, 1)
        return base_lr * (1.0 - frac * (1.0 - lrf))

    return schedule


def make_optimizer(
    learning_rate: float = 1e-3,
    lrf: float = 0.1,
    total_epochs: int = 100,
    steps_per_epoch: int = 1000,
    grad_clip: Optional[float] = None,
    accumulate_steps: int = 1,
    trainable_mask=None,
    betas: tuple[float, float] = (0.9, 0.999),
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam + linear-decay LR (+ optional clip/accumulation/freezing).

    `weight_decay` applies decoupled decay to WEIGHT tensors only (rank >= 2)
    — BN scales and biases are exempt, the reference `smart_optimizer`'s
    3-param-group split (`/root/reference/src/utils/torch_utils_yolo.py:263-290`).
    """
    sched = linear_lr_schedule(learning_rate, lrf, total_epochs, steps_per_epoch)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    if weight_decay:
        chain.append(optax.add_decayed_weights(
            weight_decay,
            mask=lambda params: jax.tree_util.tree_map(lambda p: p.ndim >= 2, params),
        ))
    chain.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.chain(
            optax.masked(tx, trainable_mask),
            optax.masked(optax.set_to_zero(),
                         jax.tree_util.tree_map(lambda t: not t, trainable_mask)),
        )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: tuple[int, ...],
    tx: Optional[optax.GradientTransformation] = None,
    variables: Optional[dict] = None,
    ema: bool = False,
    **opt_kwargs,
) -> TrainState:
    """Initialize (or adopt converted) variables and build the state.

    `ema=True` keeps an EMA shadow copy of the params, updated inside the
    train step (reference `ModelEMA`, `torch_utils_yolo.py:315-349`).
    """
    if variables is None:
        # jit the init: flax init otherwise executes eagerly op-by-op, which
        # pays a device dispatch round-trip per op — minutes over a remote
        # (tunneled) TPU vs seconds as one compiled program
        variables = jax.jit(
            lambda k, x: model.init(k, x, train=False)
        )(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if tx is None:
        tx = make_optimizer(**opt_kwargs)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=jax.jit(tx.init)(params),
        tx=tx,
        ema_params=jax.tree_util.tree_map(jnp.array, params) if ema else None,
    )


def shrink_perturb(params, rng: jax.Array, lam: float = 0.5, sigma: float = 0.01):
    """θ_w <- λ·θ_w + N(0, σ) on weight tensors (rank >= 2), biases/scales
    untouched — warm-start trick (`/root/reference/src/train.py:598-604`)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    new_leaves = [
        lam * leaf + sigma * jax.random.normal(k, leaf.shape, leaf.dtype)
        if leaf.ndim >= 2 else leaf
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
