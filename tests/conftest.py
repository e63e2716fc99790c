"""Test harness configuration.

Runs everything on a virtual 8-device CPU mesh so multi-chip sharding logic
is exercised without TPU hardware.  The environment may pre-import jax (the
axon sitecustomize registers the TPU plugin at interpreter start), so the
platform override must go through ``jax.config`` — plain ``os.environ``
writes are too late.  Backends initialize lazily, so this works as long as
no jax computation ran yet.
"""
import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: repeat suite runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/sic_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REFERENCE_DIR = Path("/root/reference")


def reference_fixture(relpath: str) -> Path:
    """Path to a read-only golden artifact shipped with the reference tree."""
    return REFERENCE_DIR / relpath


def requires_reference():
    """Module-level skip marker for tests needing the reference tree."""
    import pytest
    return pytest.mark.skipif(not REFERENCE_DIR.exists(),
                              reason="reference tree not mounted")
