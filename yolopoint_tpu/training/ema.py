"""Model EMA + early stopping + step profiling.

TPU-native equivalents of the reference torch utilities
(`ModelEMA` `/root/reference/src/utils/torch_utils_yolo.py:315-349`,
`EarlyStopping` `:292-312`, `profile` `:95-144`): EMA is a pure pytree
update with the same ramped decay `d * (1 - exp(-step/tau))`; profiling hooks
into `jax.profiler` traces instead of per-layer thop timers.
"""

from __future__ import annotations

import contextlib
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp


def ema_update(ema_params: Any, params: Any, step: jax.Array, decay: float = 0.9999, tau: float = 2000.0) -> Any:
    """One EMA step with warmup-ramped decay (reference `ModelEMA.update`)."""
    d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema_params, params)


class EarlyStopping:
    """Stop when fitness hasn't improved for `patience` epochs
    (reference `EarlyStopping`, `torch_utils_yolo.py:292-312`)."""

    def __init__(self, patience: int = 30):
        self.best_fitness = -math.inf
        self.best_epoch = 0
        self.patience = patience or math.inf

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """`with profile_trace("logs/profile"):` captures a jax.profiler trace
    viewable in TensorBoard/XProf — replaces the reference's thop per-layer
    profiler (SURVEY.md §5 tracing)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
