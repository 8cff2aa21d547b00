"""Surface-completeness audits against the reference checkout.

Three exhaustive checks (skipped when /root/reference is absent):
- every public def/class in every reference lib/ module exists in some
  helicon_tpu namespace,
- every plugin option_name of every reference plugin family is
  dispatchable in the matching helicon_tpu registry,
- every reference command module has a helicon_tpu counterpart exposing
  add_args/main.
"""

import ast
import importlib
import pathlib

import pytest

REF = pathlib.Path("/root/reference/src/helicon")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference checkout not available"
)

_NAMESPACES = [
    "helicon_tpu",
    "helicon_tpu.utils",
    "helicon_tpu.io",
    "helicon_tpu.core.transforms",
    "helicon_tpu.core.filters",
    "helicon_tpu.core.analysis",
    "helicon_tpu.core.curvelet",
    "helicon_tpu.core.alignment",
    "helicon_tpu.core.ptycho",
    "helicon_tpu.angular",
    "helicon_tpu.point_group",
    "helicon_tpu.clustering",
    "helicon_tpu.gauss",
    "helicon_tpu.utils.shiny",
    "helicon_tpu.io.dataset",
    "helicon_tpu.io.epu",
    "helicon_tpu.io.groups",
    "helicon_tpu.io.metadata",
    "helicon_tpu.io.mrc",
    "helicon_tpu.utils.cache",
    "helicon_tpu.utils.logging",
    "helicon_tpu.utils.system",
    "helicon_tpu.utils.collections",
    "helicon_tpu.utils.path_utils",
    "helicon_tpu.utils.exceptions",
]


def test_every_lib_function_exists():
    nss = [importlib.import_module(m) for m in _NAMESPACES]

    def exists(name):
        return any(hasattr(ns, name) for ns in nss)

    gaps = {}
    for f in sorted((REF / "lib").glob("*.py")):
        if f.name == "__init__.py":
            continue
        tree = ast.parse(f.read_text())
        miss = [
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.ClassDef))
            and not n.name.startswith("_")
            and not exists(n.name)
        ]
        if miss:
            gaps[f.name] = miss
    assert not gaps, gaps


def test_every_plugin_option_dispatchable():
    from helicon_tpu.ops import cryosparc as p_cs
    from helicon_tpu.ops import images2star as p_i2s
    from helicon_tpu.ops import proc3d as p_p3d

    regs = {
        "images2star": set(p_i2s._plugins),
        "proc3d": set(p_p3d._plugins),
        "cryosparc": set(p_cs._plugins),
    }
    gaps = []
    for fam, reg in regs.items():
        for f in sorted((REF / "plugins" / fam).glob("*.py")):
            if f.name == "__init__.py":
                continue
            for node in ast.walk(ast.parse(f.read_text())):
                if (
                    isinstance(node, ast.Assign)
                    and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id == "option_name"
                    and isinstance(node.value, ast.Constant)
                    and node.value.value not in reg
                ):
                    gaps.append((fam, node.value.value))
    assert not gaps, gaps


def test_every_command_flag_has_counterpart():
    """Every argparse flag a reference command declares (positional dest,
    long or short option) is accepted by our counterpart's add_args, so a
    reference user's scripts parse unchanged."""
    import argparse

    gaps = {}
    for f in sorted((REF / "commands").glob("*.py")):
        name = f.stem
        if name == "__init__":
            continue
        ref_flags = set()
        for node in ast.walk(ast.parse(f.read_text())):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"
                and node.args
                and isinstance(node.args[0], ast.Constant)
                and isinstance(node.args[0].value, str)
            ):
                ref_flags.add(node.args[0].value)
        m = importlib.import_module(f"helicon_tpu.commands.{name}")
        parser = argparse.ArgumentParser()
        m.add_args(parser)
        ours = set()
        for action in parser._actions:
            for opt in action.option_strings:
                ours.add(opt.lstrip("-"))
            if not action.option_strings:
                ours.add(action.dest)
        miss = sorted(fl for fl in ref_flags if fl.lstrip("-") not in ours)
        if miss:
            gaps[name] = miss
    assert not gaps, gaps


def test_every_command_has_counterpart():
    gaps = []
    for f in sorted((REF / "commands").glob("*.py")):
        name = f.stem
        if name == "__init__":
            continue
        try:
            m = importlib.import_module(f"helicon_tpu.commands.{name}")
            assert hasattr(m, "add_args") and hasattr(m, "main")
        except Exception as e:  # noqa: BLE001
            gaps.append((name, str(e)[:80]))
    assert not gaps, gaps
