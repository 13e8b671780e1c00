"""Checkpoint save/restore (orbax) with the reference's state surface.

The reference saves `{epoch, global_step, model/optimizer/scheduler
state_dicts, fitness, names, version, model_name, config}` tarballs with a
rolling `best` (`/root/reference/src/train.py:570-596`). Here the same
information is an orbax composite checkpoint: model params + BN stats + opt
state + a JSON metadata blob; `best` tracking keeps only the newest best like
the reference's delete-old behavior. Torch `.pth.tar` checkpoints are
importable via `yolopoint_tpu.models.convert.load_torch_checkpoint`.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _np_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    """Rolling train checkpoints + best-fitness tracking."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory / "ckpts",
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._best_path = self.directory / "best"
        self._ckpt = ocp.StandardCheckpointer()

    def save(
        self,
        step: int,
        state,
        metadata: Optional[dict[str, Any]] = None,
        fitness: Optional[float] = None,
        best: bool = False,
    ) -> None:
        payload = {
            "params": _np_tree(state.params),
            "batch_stats": _np_tree(state.batch_stats),
            "opt_state": _np_tree(state.opt_state),
            "step": int(state.step),
        }
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = _np_tree(state.ema_params)
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        meta = dict(metadata or {})
        if fitness is not None:
            meta["fitness"] = float(fitness)
        (self.directory / f"meta_{step}.json").write_text(json.dumps(meta, default=str))
        if best:
            # keep only the newest best (reference deletes the old best tar)
            best_dir = self._best_path
            if best_dir.exists():
                import shutil

                shutil.rmtree(best_dir)
            self._ckpt.save(best_dir, payload)
            # StandardCheckpointer is async — block before anyone reads `best`
            self._ckpt.wait_until_finished()
            (self.directory / "best_meta.json").write_text(json.dumps(meta, default=str))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing state template (shapes/dtypes must match)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        template = {
            "params": _np_tree(state.params),
            "batch_stats": _np_tree(state.batch_stats),
            "opt_state": _np_tree(state.opt_state),
            "step": 0,
        }
        if getattr(state, "ema_params", None) is not None:
            template["ema_params"] = _np_tree(state.ema_params)
        payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        meta_path = self.directory / f"meta_{step}.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        new_state = state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=np.asarray(payload["step"], np.int32),
        )
        if "ema_params" in payload:
            new_state = new_state.replace(ema_params=payload["ema_params"])
        return new_state, meta

    def restore_best(self, state):
        if not self._best_path.exists():
            return None, None
        template = {
            "params": _np_tree(state.params),
            "batch_stats": _np_tree(state.batch_stats),
            "opt_state": _np_tree(state.opt_state),
            "step": 0,
        }
        if getattr(state, "ema_params", None) is not None:
            template["ema_params"] = _np_tree(state.ema_params)
        payload = self._ckpt.restore(self._best_path, target=template)
        meta_path = self.directory / "best_meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        restored = state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"], step=np.asarray(payload["step"], np.int32),
        )
        if "ema_params" in payload:
            restored = restored.replace(ema_params=payload["ema_params"])
        return restored, meta


def load_run_variables(path, prefer_ema: bool = True) -> dict:
    """Weights-only restore for inference/export from a training run.

    Accepts a run directory (containing `best/` or `ckpts/`), the `best/`
    directory itself, or a specific orbax step directory; no state template
    needed. Returns `{"params": ..., "batch_stats": ...}` ready for
    `model.apply`, preferring the EMA shadow when present (the reference
    validates and ships EMA weights, `torch_utils_yolo.py:315-349`).
    """
    p = Path(path).resolve()
    if (p / "best").exists():
        p = p / "best"
    elif (p / "ckpts").exists():
        steps = sorted(
            int(d.name) for d in (p / "ckpts").iterdir() if d.name.isdigit()
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {p / 'ckpts'}")
        p = p / "ckpts" / str(steps[-1])
    payload = ocp.StandardCheckpointer().restore(p)
    params = payload.get("params")
    if prefer_ema and payload.get("ema_params"):
        params = payload["ema_params"]
    return {"params": params, "batch_stats": payload.get("batch_stats", {})}
