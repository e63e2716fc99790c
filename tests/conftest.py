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
# persistent XLA compile cache: repeat suite runs skip recompilation.
# Host-ISA-keyed subdir (cli/_common.py): CPU AOT entries bake the
# compiling host's ISA, and mixing entries from the remote-compile
# service in one flat dir makes XLA log SIGILL warnings on every load.
try:
    from sic_tpu.cli._common import _host_isa_tag
    _cache = f"/tmp/sic_tpu_xla_cache/cpu-{_host_isa_tag()}"
except Exception:
    _cache = "/tmp/sic_tpu_xla_cache/cpu"
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
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


# Modules whose tests dominate the suite wall-clock (port oracles against
# the reference torch tree, multi-process subprocess runs, end-to-end CLI
# drives).  They are auto-marked ``slow`` so the default dev loop is
# ``pytest -m "not slow"``; the full suite stays the CI/driver contract.
SLOW_MODULES = {
    "test_multihost", "test_port_full_codec", "test_port_parity",
    "test_titok", "test_maskgit", "test_rans_interop", "test_train_cli",
    "test_cli", "test_service", "test_convergence",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
