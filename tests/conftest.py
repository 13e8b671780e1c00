"""Test configuration: run JAX on CPU with 8 virtual devices.

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-device
tests emulate an 8-device mesh without a TPU).
"""

import os

# YP_TPU_TESTS=1 keeps the real TPU backend so the `tpu`-marked hardware
# parity gates (tests/test_tpu_parity.py) can run compiled Mosaic kernels:
#   YP_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -m tpu -v
_ON_TPU = os.environ.get("YP_TPU_TESTS", "") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" via
# jax.config at interpreter start, overriding the env var — override it back
# BEFORE any backend initializes so tests run on the 8-device virtual CPU.
import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# persistent XLA compile cache: the heavy train/val-step compiles (~5 min
# each on this 1-core host) hit the cache on re-runs of the suite
from yolopoint_tpu.utils.logging import enable_compile_cache

enable_compile_cache("/tmp/yolopoint_jax_cache_tests")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
