"""Shared test fixtures.

Sharding tests run on a virtual 8-device CPU mesh (the TPU design is validated
on CPU here; the driver separately dry-runs the multi-chip path). Setting the
XLA flags must happen before jax initializes, hence at conftest import time.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
try:
    # This environment's sitecustomize registers a TPU-tunnel PJRT plugin and
    # pins jax_platforms; re-pin to CPU before any backend is instantiated so
    # the test suite never rides the tunnel.
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
REFTEST_IMAGES = REFERENCE / "tests" / "reftest" / "images"
CRASHTEST_IMAGES = REFERENCE / "tests" / "crashtest" / "images"
ICC_FIXTURES = REFERENCE / "tests" / "icc"

sys.path.insert(0, str(REPO_ROOT))


def reftest_files():
    """All reftest jpgs minus disabled.list (`/root/reference/tests/common/mod.rs:6-40`)."""
    files = sorted(
        p for p in REFTEST_IMAGES.rglob("*.jp*g") if p.suffix in (".jpg", ".jpeg"))
    disabled = set()
    disabled_list = REFTEST_IMAGES / "disabled.list"
    if disabled_list.exists():
        for line in disabled_list.read_text().splitlines():
            line = line.strip()
            if line and not line.startswith("#"):
                disabled.add((REFTEST_IMAGES / line).resolve())
    return [p for p in files if p.resolve() not in disabled]


def crashtest_files():
    return sorted(CRASHTEST_IMAGES.rglob("*.jpg"))
