"""Examples stay importable: every name an example pulls from the package
must exist (catches API drift without executing the heavy scripts)."""

import ast
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).resolve().parents[1] / "examples").glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_imports_resolve(path):
    tree = ast.parse(path.read_text())
    import importlib

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
                node.module.startswith("dlimgedit_tpu")):
            mod = importlib.import_module(node.module)
            for alias in node.names:
                assert hasattr(mod, alias.name), (
                    f"{path.name}: {node.module}.{alias.name} no longer exists")
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("dlimgedit_tpu"):
                    importlib.import_module(alias.name)
