"""Every [project.scripts] target must resolve to a callable — a rename
or a forgotten registration (e.g. a new CLI) breaks installed users even
when `python -m` still works."""
import importlib
import re
from pathlib import Path


def test_project_scripts_resolve():
    text = (Path(__file__).parents[1] / "pyproject.toml").read_text()
    block = re.search(r"\[project\.scripts\](.*?)(\n\[|\Z)", text, re.S)
    assert block
    entries = re.findall(r'^([\w-]+)\s*=\s*"([\w.]+):(\w+)"',
                         block.group(1), re.M)
    assert len(entries) >= 8, entries
    for name, module, attr in entries:
        mod = importlib.import_module(module)
        assert callable(getattr(mod, attr)), f"{name} -> {module}:{attr}"

    # every CLI module with a main() is registered
    cli_dir = Path(__file__).parents[1] / "sic_tpu" / "cli"
    registered = {m for _, m, _ in entries}
    for p in sorted(cli_dir.glob("*.py")):
        if p.name.startswith("_"):
            continue
        if "def main(" in p.read_text():
            assert f"sic_tpu.cli.{p.stem}" in registered, \
                f"sic_tpu.cli.{p.stem} has a main() but no console script"
