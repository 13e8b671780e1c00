"""YAML config loading compatible with the reference config schema.

The reference merges YAML + CLI via a recursive `dict_update`
(`/root/reference/src/train.py:639-642`, `/root/reference/src/utils/utils.py:77-92`)
and supports multi-dataset composition via `sub_configs` include+override
(`/root/reference/src/utils/loader.py:81-90`). Same behavior here so the
reference's `configs/*.yaml` remain usable; config snapshots are embedded in
checkpoints like the reference (`/root/reference/src/train.py:593`).
"""

from __future__ import annotations

import copy
from collections.abc import Mapping
from pathlib import Path
from typing import Any

import yaml


def dict_update(d: dict, u: Mapping) -> dict:
    """Recursive dict merge (update wins); mutates and returns `d`."""
    for k, v in u.items():
        if isinstance(v, Mapping):
            d[k] = dict_update(d.get(k, {}) or {}, v)
        else:
            d[k] = v
    return d


def load_config(path: str | Path, overrides: Mapping | None = None) -> dict:
    """Load a YAML config and apply overrides."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if overrides:
        dict_update(cfg, overrides)
    return cfg


def resolve_sub_configs(cfg: dict, config_dir: str | Path) -> list[dict]:
    """Expand a `sub_configs` composite into per-dataset configs.

    Each entry of `data.sub_configs` names a YAML file (relative to
    `config_dir`) plus overrides; the parent config is the base
    (reference `loader.py:81-90`, `configs/concat_datasets.yaml`).
    """
    data = cfg.get("data", {})
    subs = data.get("sub_configs")
    if not subs:
        return [cfg]
    out = []
    for entry in subs:
        if isinstance(entry, str):
            sub_path, sub_over = entry, {}
        else:
            sub_path, sub_over = entry["config"], entry.get("overrides", {})
        sub = load_config(Path(config_dir) / sub_path)
        merged = copy.deepcopy(cfg)
        merged.pop("data", None)
        merged["data"] = sub.get("data", {})
        dict_update(merged, {k: v for k, v in sub.items() if k != "data"})
        dict_update(merged, sub_over)
        out.append(merged)
    return out


def save_config(cfg: dict, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def get(cfg: Mapping, dotted: str, default: Any = None) -> Any:
    """`get(cfg, 'model.superpoint.nms', 4)` — dotted access with default."""
    node: Any = cfg
    for part in dotted.split("."):
        if not isinstance(node, Mapping) or part not in node:
            return default
        node = node[part]
    return node
