"""Production entry-point environment handling: platform re-assertion and
the per-platform persistent compile cache (cli/_common.py).

These run in subprocesses because both helpers mutate process-global jax
config that the suite's conftest also manages.
"""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(code: str, **env):
    e = dict(os.environ, **env)
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=e,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-1500:]
    return r.stdout.strip()


def test_respect_platform_env_overrides_sitecustomize():
    out = _run(
        "from sic_tpu.cli._common import respect_platform_env\n"
        "respect_platform_env()\n"
        "import jax\n"
        "print(jax.config.jax_platforms)",
        JAX_PLATFORMS="cpu")
    assert out == "cpu"


def test_compile_cache_is_per_platform(tmp_path):
    out = _run(
        "from sic_tpu.cli._common import (respect_platform_env,"
        " enable_compile_cache)\n"
        "respect_platform_env(); enable_compile_cache()\n"
        "import jax\n"
        "print(jax.config.jax_compilation_cache_dir)",
        JAX_PLATFORMS="cpu", SIC_XLA_CACHE=str(tmp_path / "xc"))
    # cpu caches carry a host-ISA fingerprint (remote-compiled CPU AOT
    # entries target another machine's ISA and can SIGILL here)
    from sic_tpu.cli._common import _host_isa_tag
    sub = f"cpu-{_host_isa_tag()}"
    assert out == str(tmp_path / "xc" / sub)
    assert (tmp_path / "xc" / sub).is_dir()


def test_compile_cache_off_switch(tmp_path):
    out = _run(
        "from sic_tpu.cli._common import enable_compile_cache\n"
        "enable_compile_cache()\n"
        "import jax\n"
        "print(repr(jax.config.jax_compilation_cache_dir))",
        JAX_PLATFORMS="cpu", SIC_XLA_CACHE="off")
    assert out in ("None", "''")
