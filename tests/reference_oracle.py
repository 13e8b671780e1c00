"""Helpers to load the reference torch implementation as a test oracle.

The reference repo at /root/reference is read-only PUBLIC content used here
ONLY to generate golden outputs for parity tests — its modules are imported,
never copied. `torchvision` is absent in this image, so a minimal stub is
installed before import (only `ops.nms` is referenced at module level).
"""

import sys
import types
from pathlib import Path

REFERENCE_SRC = Path("/root/reference/src")


def install_torchvision_stub():
    """Stub the third-party modules absent from this image that the reference
    imports at module scope (torchvision, pkg_resources)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")

        def _nms_unavailable(*a, **k):  # pragma: no cover
            raise RuntimeError("torchvision stub: nms not available in tests")

        ops.nms = _nms_unavailable
        tv.ops = ops
        tv.__version__ = "0.0.0-stub"
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops

    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            pkg = types.ModuleType("pkg_resources")

            def parse_version(v):
                parts = []
                for tok in str(v).split("."):
                    num = "".join(ch for ch in tok if ch.isdigit())
                    parts.append(int(num) if num else 0)
                return tuple(parts)

            pkg.parse_version = parse_version
            sys.modules["pkg_resources"] = pkg


def import_reference_model_module():
    """Import the reference `models.YOLOPoint` module (torch)."""
    install_torchvision_stub()
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    import importlib

    return importlib.import_module("models.YOLOPoint")
