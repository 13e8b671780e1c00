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


def variables_to_jnp(variables: dict, dtype=jnp.float32) -> dict:
    """Cast numpy leaves to jnp arrays of `dtype` (params only; stats f32)."""
    import jax

    def cast(x):
        return jnp.asarray(x, dtype)

    return jax.tree_util.tree_map(cast, variables)
