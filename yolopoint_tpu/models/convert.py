"""Torch checkpoint -> Flax variables converter.

Reads the reference checkpoint schema (`/root/reference/src/train.py:583-596`:
a dict with `model_state_dict` etc., or a bare state dict) and produces the
`{'params': ..., 'batch_stats': ...}` variable tree for the Flax models in
`yolopoint_tpu.models.yolopoint`. Because submodule names mirror the torch
attribute names, the mapping is purely mechanical:

* strip the leading `model.` (the reference meta-`Model` wrapper,
  `/root/reference/src/models/YOLOPoint.py:51-57`)
* `.m.<i>.` module-list indices -> `.m_<i>.` (C3/C2f bottlenecks, Detect convs)
* conv `weight` `(O, I, kh, kw)` -> `kernel` `(kh, kw, I, O)`
* BatchNorm `weight/bias/running_mean/running_var` ->
  `scale/bias` (params) + `mean/var` (batch_stats)
* buffers (`num_batches_tracked`, `anchors`, `anchor_grid`, `stride`) dropped
  (anchors/strides are static model attributes here).

Also provides `fold_batch_norm` — the conv+BN fusion the reference applies at
inference (`Model.fuse`, `/root/reference/src/models/YOLOPoint.py:84-90`),
done once at parameter level instead of module surgery.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _set_path(tree: dict, path: list[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_SKIP_SUFFIXES = ("num_batches_tracked", "anchors", "anchor_grid", "stride")


def torch_state_dict_to_variables(state_dict: Mapping[str, Any]) -> dict:
    """Convert a torch state dict (tensors or numpy arrays) to Flax variables.

    Returns `{'params': ..., 'batch_stats': ...}` with numpy leaves.
    """
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        if key.endswith(_SKIP_SUFFIXES):
            continue
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        name = key
        if name.startswith("model."):
            name = name[len("model."):]
        # module-list indices: '.m.0.' -> '.m_0.', '.conv.1.' -> '.conv_1.'
        name = re.sub(r"\.([A-Za-z_]\w*)\.(\d+)\.", r".\1_\2.", name)
        name = re.sub(r"^([A-Za-z_]\w*)\.(\d+)\.", r"\1_\2.", name)
        parts = name.split(".")
        leaf = parts[-1]
        module_path = parts[:-1]
        if len(parts) >= 2 and parts[-2] == "bn":
            if leaf == "weight":
                _set_path(params, module_path + ["scale"], arr)
            elif leaf == "bias":
                _set_path(params, module_path + ["bias"], arr)
            elif leaf == "running_mean":
                _set_path(batch_stats, module_path + ["mean"], arr)
            elif leaf == "running_var":
                _set_path(batch_stats, module_path + ["var"], arr)
            else:
                raise ValueError(f"unhandled bn leaf in {key}")
        elif leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                _set_path(params, module_path + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:  # linear (transformer blocks) O,I -> I,O
                _set_path(params, module_path + ["kernel"], arr.T)
            elif arr.ndim == 1:  # bare BatchNorm not under a 'bn' name
                _set_path(params, module_path + ["scale"], arr)
            else:
                raise ValueError(f"unhandled weight rank {arr.ndim} in {key}")
        elif leaf == "bias":
            _set_path(params, module_path + ["bias"], arr)
        elif leaf == "running_mean":
            _set_path(batch_stats, module_path + ["mean"], arr)
        elif leaf == "running_var":
            _set_path(batch_stats, module_path + ["var"], arr)
        else:
            raise ValueError(f"unhandled leaf {leaf!r} in key {key}")
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference `.pth.tar` checkpoint into Flax variables + metadata.

    The reference schema (`/root/reference/src/train.py:583-596`) stores
    `model_state_dict`, `names`, `version`, `model_name`, `config`, `epoch`...
    Bare state dicts are also accepted.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
        meta = {k: v for k, v in ckpt.items() if k != "model_state_dict"
                and not k.endswith("state_dict")}
    else:
        sd, meta = ckpt, {}
    return {"variables": torch_state_dict_to_variables(sd), "meta": meta}


def load_weights(path) -> dict:
    """Unified weights loader for every CLI/entry point: reference torch
    `.pth(.tar)` files (converted to Flax) OR this framework's own orbax
    run/best/step directories (EMA-preferred). Returns
    `{"variables": {"params", "batch_stats"}, "meta": {...}}`.
    """
    import json
    from pathlib import Path

    p = Path(path)
    if p.is_dir():
        from yolopoint_tpu.training.checkpoint import load_run_variables

        variables = load_run_variables(p)
        meta = {}
        for mp in (p / "best_meta.json", p.parent / "best_meta.json"):
            if mp.exists():
                meta = json.loads(mp.read_text())
                break
        return {"variables": variables, "meta": meta}
    return load_torch_checkpoint(str(p))


def merge_partial_variables(
    target: Mapping[str, Any],
    source: Mapping[str, Any],
    verbose: bool = False,
) -> tuple[dict, dict]:
    """Class-aware partial load: copy every leaf whose path exists in both
    trees with matching shape; everything else keeps the (freshly
    initialized) target value.

    This is the path-based equivalent of the reference's
    `load_state_dict`/`load_partial_state_dict`
    (`/root/reference/src/models/YOLOPoint.py:102-135`): when the class count
    changes, the Detect conv kernels/biases shape-mismatch and stay at their
    fresh initialization while the rest of the net loads.

    Returns (merged_variables, report) with report lists of dotted paths:
    `loaded`, `shape_mismatch`, `missing_in_source`, `unused_in_source`.
    """
    report = {"loaded": [], "shape_mismatch": [], "missing_in_source": [],
              "unused_in_source": []}

    def walk(t: Mapping, s: Mapping, path: str) -> dict:
        out = {}
        for k, tv in t.items():
            p = f"{path}.{k}" if path else k
            if isinstance(tv, Mapping):
                sv = s.get(k) if isinstance(s, Mapping) else None
                out[k] = walk(tv, sv if isinstance(sv, Mapping) else {}, p)
            else:
                sv = s.get(k) if isinstance(s, Mapping) else None
                if sv is not None and not isinstance(sv, Mapping) \
                        and np.shape(sv) == np.shape(tv):
                    out[k] = sv
                    report["loaded"].append(p)
                elif sv is not None and not isinstance(sv, Mapping):
                    out[k] = tv
                    report["shape_mismatch"].append(p)
                else:
                    out[k] = tv
                    report["missing_in_source"].append(p)
        return out

    def collect_extra(t: Mapping, s: Mapping, path: str) -> None:
        for k, sv in s.items():
            p = f"{path}.{k}" if path else k
            tv = t.get(k) if isinstance(t, Mapping) else None
            if isinstance(sv, Mapping):
                collect_extra(tv if isinstance(tv, Mapping) else {}, sv, p)
            elif tv is None:
                report["unused_in_source"].append(p)

    merged = {col: walk(target[col], source.get(col, {}), col)
              for col in target}
    for col in target:
        collect_extra(target[col], source.get(col, {}), col)
    if verbose:
        for k, v in report.items():
            print(f"merge_partial_variables: {k}: {len(v)}")
    return merged, report


# torch leaf names for the transplant's name-tail comparison
_LEAF_TO_TORCH = {
    ("conv", "kernel"): "conv.weight", ("conv", "bias"): "conv.bias",
    ("bn", "scale"): "bn.weight", ("bn", "bias"): "bn.bias",
    ("bn", "mean"): "bn.running_mean", ("bn", "var"): "bn.running_var",
}


def transplant_yolo_backbone(
    yolo_state_dict: Mapping[str, Any],
    target_variables: Mapping[str, Any],
    module_order=None,
    verbose: bool = False,
) -> tuple[dict, int]:
    """Transplant a pretrained (ultralytics-style, numerically indexed) YOLO
    state dict into a YOLOPoint variable tree by zipping both parameter
    sequences in torch declaration order and copying while the (module-local
    name, shape) pairs line up — stopping at the first divergence, exactly
    the reference `load_pretrained_yolo`
    (`/root/reference/src/utils/utils.py:64-75`).

    Returns (new_variables, number_of_copied_tensors).
    """
    from yolopoint_tpu.training.state import iter_params_reference_order

    # our sequence: params + sibling bn batch_stats in torch traversal order
    stats = target_variables.get("batch_stats", {})

    def stats_leaf(path, name):
        node = stats
        for p in path[:-1]:
            node = node.get(p, {}) if isinstance(node, Mapping) else {}
        return node.get(name) if isinstance(node, Mapping) else None

    ours: list[tuple[tuple, str, Any]] = []  # (path, torch-style tail, value)
    for path, leaf in iter_params_reference_order(
        target_variables["params"], module_order
    ):
        tail = _LEAF_TO_TORCH.get(path[-2:], ".".join(path[-2:]))
        ours.append((path, tail, leaf))
        if path[-2:] == ("bn", "bias"):  # torch: running stats follow bias
            for stat, tname in (("mean", "bn.running_mean"), ("var", "bn.running_var")):
                sv = stats_leaf(path, stat)
                if sv is not None:
                    ours.append((path[:-1] + (f"__stat_{stat}",), tname, sv))

    theirs = [
        (k, ".".join(k.split(".")[-2:]), v)
        for k, v in yolo_state_dict.items()
        if not k.endswith(("num_batches_tracked", "anchors", "anchor_grid", "stride"))
    ]

    new_vars = jax.tree_util.tree_map(np.asarray, dict(target_variables))
    copied = 0
    for (path, tail_a, ours_v), (tk, tail_b, theirs_v) in zip(ours, theirs):
        arr = np.asarray(theirs_v.detach().cpu().numpy()
                         if hasattr(theirs_v, "detach") else theirs_v)
        if tail_a.split(".")[-1] != tail_b.split(".")[-1]:
            break
        if tail_a.endswith("conv.weight"):
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if arr.shape != np.shape(ours_v):
            break
        col = "batch_stats" if path[-1].startswith("__stat_") else "params"
        node = new_vars[col]
        real_path = (path[:-1] + (path[-1].removeprefix("__stat_"),)) \
            if col == "batch_stats" else path
        for p in real_path[:-1]:
            node = node[p]
        node[real_path[-1]] = arr
        copied += 1
        if verbose:
            print(f"transplant: {tk} -> {'.'.join(map(str, real_path))}")
    return new_vars, copied


def _fold_one(tree_p: dict, tree_s: dict, out: dict) -> None:
    for name, sub in tree_p.items():
        if name == "bn":
            continue
        if isinstance(sub, Mapping):
            out[name] = {}
            _fold_one(sub, tree_s.get(name, {}) if isinstance(tree_s, Mapping) else {}, out[name])
        else:
            out[name] = sub
    # fold sibling bn into sibling conv
    if "bn" in tree_p and "conv" in out:
        bn_p, bn_s = tree_p["bn"], tree_s["bn"]
        from yolopoint_tpu.models.blocks import BN_EPS

        scale = np.asarray(bn_p["scale"], np.float64)
        bias = np.asarray(bn_p["bias"], np.float64)
        mean = np.asarray(bn_s["mean"], np.float64)
        var = np.asarray(bn_s["var"], np.float64)
        factor = scale / np.sqrt(var + BN_EPS)
        kernel = np.asarray(out["conv"]["kernel"], np.float64)
        out["conv"]["kernel"] = (kernel * factor).astype(np.float32)
        out["conv"]["bias"] = (bias - mean * factor).astype(np.float32)


def fold_batch_norm(variables: dict) -> dict:
    """Fold every sibling (conv, bn) pair into a biased conv.

    The result is used with models built with `fused=True` — the inference
    `fuse()` path of the reference (`/root/reference/src/models/YOLOPoint.py:84-90`).
    """
    out: dict = {}
    _fold_one(variables["params"], variables.get("batch_stats", {}), out)
    return {"params": out}


def variables_to_torch_state_dict(
    variables: Mapping[str, Any],
    prefix: str = "model.",
) -> dict:
    """Inverse of `torch_state_dict_to_variables`: export Flax variables as a
    reference-schema torch state dict (numpy values), so models trained here
    load straight into the reference's `Model.load_state_dict`
    (`/root/reference/src/models/YOLOPoint.py:102`) and its ROS stack.

    * `m_0` style module-list names -> `m.0`
    * conv `kernel` HWIO -> `weight` OIHW; linear kernel transposed
    * bn `scale`/`bias` -> `weight`/`bias`; stats -> `running_mean/var`
    * `prefix` restores the meta-`Model` wrapper namespace.
    """
    out: dict = {}

    def torch_name(path: list[str], leaf: str) -> str:
        parts = []
        for p in path:
            head, _, tail = p.rpartition("_")
            parts.append(f"{head}.{tail}" if head and tail.isdigit() else p)
        return prefix + ".".join(parts + [leaf])

    def walk_params(node: Mapping, path: list[str]) -> None:
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk_params(v, path + [k])
                continue
            arr = np.asarray(v)
            if k == "kernel":
                if arr.ndim == 4:
                    out[torch_name(path, "weight")] = arr.transpose(3, 2, 0, 1)
                else:
                    out[torch_name(path, "weight")] = arr.T
            elif k == "scale":
                out[torch_name(path, "weight")] = arr
            else:  # bias
                out[torch_name(path, k)] = arr

    def walk_stats(node: Mapping, path: list[str]) -> None:
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk_stats(v, path + [k])
            elif k in ("mean", "var"):
                out[torch_name(path, f"running_{k}")] = np.asarray(v)

    walk_params(variables["params"], [])
    walk_stats(variables.get("batch_stats", {}), [])
    return out


def variables_to_jnp(variables: dict, dtype=jnp.float32) -> dict:
    """Cast numpy leaves to jnp arrays of `dtype` (params only; stats f32)."""
    import jax

    def cast(x):
        return jnp.asarray(x, dtype)

    return jax.tree_util.tree_map(cast, variables)
