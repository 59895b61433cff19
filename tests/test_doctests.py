"""Doctest sweep over the WHOLE package (reference CI analog:
``pytest --doctest-modules`` over every module,
ubuntu_test_cuda_CI.jenkins:436). Runs inside the test session so the
CPU-forcing conftest applies; asserts a minimum example count so the sweep
can't silently go vacuous.

Modules are discovered by walking ``kaolin_tpu`` on disk — a new module
with a broken example fails here without being registered anywhere."""

import doctest
import importlib
import os
import pkgutil

import pytest

import kaolin_tpu

# imports that pull optional heavyweight deps the image may lack; their
# import failure is the gate (covered by dedicated tests), not a doctest
# concern
_SKIP_PREFIXES = (
    "kaolin_tpu.experimental.newton",   # needs the external newton engine
)


def _walk_modules():
    root = os.path.dirname(kaolin_tpu.__file__)
    names = []
    for info in pkgutil.walk_packages([root], prefix="kaolin_tpu."):
        if info.name.startswith(_SKIP_PREFIXES):
            continue
        if info.name.rsplit(".", 1)[-1] == "__main__":
            continue   # CLI entry modules run argparse at import
        names.append(info.name)
    assert len(names) > 80, f"package walk found only {len(names)} modules"
    return sorted(names)


MODULES = _walk_modules()


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(modname):
    try:
        mod = importlib.import_module(modname)
    except ImportError as e:
        pytest.skip(f"{modname}: optional dependency missing ({e})")
    results = doctest.testmod(mod, optionflags=doctest.NORMALIZE_WHITESPACE,
                              verbose=False)
    assert results.failed == 0, f"{modname}: {results.failed} doctest failures"


def test_minimum_example_coverage():
    total = 0
    finder = doctest.DocTestFinder()
    for modname in MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        total += sum(len(t.examples) for t in finder.find(mod))
    assert total >= 25, f"only {total} doctest examples across the package"
