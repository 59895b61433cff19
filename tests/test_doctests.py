"""Doctest run over the documented public API (reference CI analog:
``pytest --doctest-modules``, ubuntu_test_cuda_CI.jenkins:436). Runs inside
the test session so the CPU-forcing conftest applies; asserts a minimum
example count so the sweep can't silently go vacuous."""

import doctest
import importlib

import pytest

MODULES = [
    "kaolin_tpu.ops.batch",
    "kaolin_tpu.ops.mesh.trianglemesh",
    "kaolin_tpu.ops.spc.points",
    "kaolin_tpu.math.quat.quaternion",
    "kaolin_tpu.metrics.pointcloud",
    "kaolin_tpu.render.spc.raytrace",
    "kaolin_tpu.render.camera.camera",
    "kaolin_tpu.rep.surface_mesh",
]


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(modname):
    mod = importlib.import_module(modname)
    results = doctest.testmod(mod, optionflags=doctest.NORMALIZE_WHITESPACE,
                              verbose=False)
    assert results.failed == 0, f"{modname}: {results.failed} doctest failures"


def test_minimum_example_coverage():
    total = 0
    finder = doctest.DocTestFinder()
    for modname in MODULES:
        mod = importlib.import_module(modname)
        total += sum(len(t.examples) for t in finder.find(mod))
    assert total >= 25, f"only {total} doctest examples across public API"
