"""Observability: rank-aware logger + scalar metrics writer.

Replaces the reference's TensorBoard SummaryWriter + rank-gated LOGGER
(`/root/reference/src/utils/general_yolo.py:46-53`,
`/root/reference/src/train.py:142-143,254-259,606-616`): metrics land in an
append-only JSONL stream (trivially plottable, greppable, driver-parsable)
and optionally mirror into TensorBoard when the package is present. The
distributed metric all-gather of the reference is unnecessary — metrics come
out of the train step already `pmean`-reduced.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Mapping, Optional

import jax


def make_logger(name: str = "yolopoint_tpu", verbose: bool = True) -> logging.Logger:
    """Process-0-only logger (multi-host: non-zero processes are silent)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(h)
    rank = jax.process_index() if jax.process_count() > 1 else 0
    logger.setLevel(logging.INFO if (verbose and rank == 0) else logging.ERROR)
    return logger


LOGGER = make_logger()


def enable_compile_cache(path: str = "/tmp/yolopoint_jax_cache") -> None:
    """Persistent XLA compilation cache shared by the CLIs and bench: the
    train step on the tunneled v5e takes minutes to compile cold, seconds
    warm (same knobs as bench.py)."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


class MetricsWriter:
    """Append-only JSONL scalar stream with optional TensorBoard mirror."""

    def __init__(self, output_dir: str | Path, use_tensorboard: bool = True):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.dir / "tensorboard"))
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Mapping[str, Any], prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            try:
                record[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, record[key], step)
        self._f.write(json.dumps(record) + "\n")

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Rolling step-time / throughput tracker (the reference's ad-hoc Profile
    timers, `/root/reference/src/utils/general_yolo.py:56-62`)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
