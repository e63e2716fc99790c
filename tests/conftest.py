"""Test harness configuration.

Runs everything on a virtual 8-device CPU mesh so multi-chip sharding logic
is exercised without TPU hardware.  Must run before the first ``import jax``.
"""
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REFERENCE_DIR = Path("/root/reference")


def reference_fixture(relpath: str) -> Path:
    """Path to a read-only golden artifact shipped with the reference tree."""
    return REFERENCE_DIR / relpath
