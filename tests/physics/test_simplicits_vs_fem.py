"""Trajectory-parity regression tests against the reference's checked-in
Warp-FEM golden data (ref ``tests/.../test_simplicits_vs_fem.py:28-63``):
run 100 sim steps of a dropped cube / cantilever beam and assert chamfer
distance to the stored FEM vertex trajectories at frames 0 / 1 / 100.

Uses the reference's pre-trained skinning-weight checkpoints (torch modules,
evaluated host-side at bake time only) so the simulated dynamics — LBS
operators, energies, Newton solve — are entirely ours.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.metrics.pointcloud import chamfer_distance
from kaolin_tpu.ops.mesh import check_sign
from kaolin_tpu.physics.simplicits import SimplicitsScene, SkinnedPhysicsPoints
from kaolin_tpu.physics.simplicits.training import SkinnedPoints

from tests.reference_shim import import_reference_kaolin

ref_kaolin = import_reference_kaolin()

DATA = ("/root/reference/tests/python/kaolin/physics/simplicits/"
        "regression_test_data")


def _load_obj(path):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return np.asarray(verts, dtype=np.float32), np.asarray(faces)


def _torch_weights_and_grads(weights_file, pts):
    """Evaluate the reference's trained skinning field (+ constant handle)
    and its spatial gradients at pts, host-side via torch."""
    import torch
    d = torch.load(weights_file, weights_only=False, map_location="cpu")
    model, bb_min, bb_max = d["model"], d["bb_min"], d["bb_max"]

    def weight_fn(x):
        norm = (x - bb_min) / (bb_max - bb_min)
        w = model(norm)
        return torch.cat([w, torch.ones(x.shape[0], 1)], dim=1)

    tp = torch.tensor(np.asarray(pts), dtype=torch.float32)
    with torch.no_grad():
        w = weight_fn(tp).numpy()
    jac = torch.func.vmap(torch.func.jacrev(lambda x: weight_fn(x[None])[0]))(tp)
    return w, jac.detach().numpy()


def _sample_interior(mesh_file, num_samples=100000, seed=0):
    verts, faces = _load_obj(mesh_file)
    rng = np.random.RandomState(seed)
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    uniform = rng.rand(num_samples, 3).astype(np.float32) * (hi - lo) + lo
    signs = check_sign(jnp.asarray(verts)[None], jnp.asarray(faces),
                       jnp.asarray(uniform)[None])
    pts = uniform[np.asarray(signs)[0]]
    vol = float(np.prod(hi - lo))
    return pts, vol


def _build_scene(mesh_name, weights_name, fem_name, yms, num_qp, dt=0.05):
    import torch
    fem = torch.load(os.path.join(DATA, fem_name), weights_only=False,
                     map_location="cpu")
    fem = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in fem.items()}
    pts, vol = _sample_interior(os.path.join(DATA, mesh_name))
    rng = np.random.RandomState(0)
    qp_idx = rng.choice(pts.shape[0], num_qp, replace=False)
    qp = pts[qp_idx]

    wfile = os.path.join(DATA, weights_name)
    w, dwdx = _torch_weights_and_grads(wfile, qp)
    rw, _ = _torch_weights_and_grads(wfile, fem["v0"])

    baked = SkinnedPhysicsPoints(
        pts=qp, yms=yms, prs=0.45, rhos=500.0, appx_vol=vol,
        skinning_weights=w, dwdx=dwdx,
        renderable=SkinnedPoints(jnp.asarray(fem["v0"]), jnp.asarray(rw)))

    scene = SimplicitsScene(timestep=dt, max_newton_steps=10, max_ls_steps=20,
                            newton_hessian_regularizer=0.0, direct_solve=True)
    scene.add_object(baked)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=-1.0, floor_axis=1,
                          floor_penalty=10000.0, flip_floor=False)
    return scene, fem


def _chamfer(a, b):
    return float(chamfer_distance(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])


def _run_regression(scene, fem, tol, name):
    ours0 = scene.get_object_deformed_pts(0, points="rendered")
    cd0 = _chamfer(fem["v0"], ours0)
    assert cd0 < tol * tol, f"{name}: chamfer at start {cd0}"

    scene.run_sim_step()
    ours1 = scene.get_object_deformed_pts(0, points="rendered")
    cd1 = _chamfer(fem["v1"], ours1)
    assert cd1 < tol * tol + 1e-5, f"{name}: chamfer at frame 1 {cd1}"

    for _ in range(99):
        scene.run_sim_step()
    ours100 = scene.get_object_deformed_pts(0, points="rendered")
    cd100 = _chamfer(fem["v_end"], ours100)
    assert cd100 < tol, f"{name}: chamfer at frame 100 {cd100}"


@pytest.mark.skipif(ref_kaolin is None, reason="reference unavailable")
def test_cube_drop_vs_fem():
    """Dropped cube vs Warp-FEM golden trajectory (ref tol 0.0015)."""
    scene, fem = _build_scene("cube_surf.obj",
                              "cube_weights_fcn_32_handles.pth",
                              "wpfem_vertex_deformations_cube.pth",
                              yms=1e4, num_qp=1000)
    _run_regression(scene, fem, tol=0.0015, name="cube_drop")


@pytest.mark.skipif(ref_kaolin is None, reason="reference unavailable")
def test_cantilever_beam_vs_fem():
    """Cantilever beam with pinned right edge vs Warp-FEM golden trajectory
    (ref tol 0.02)."""
    scene, fem = _build_scene("beam_surf.obj",
                              "beam_weights_fcn_32_handles.pth",
                              "wpfem_vertex_deformations_beam.pth",
                              yms=1e5, num_qp=1024)
    scene.set_object_boundary_condition(
        0, "right", lambda x: np.asarray(x)[:, 0] >= 0.98,
        bdry_penalty=10000.0)
    _run_regression(scene, fem, tol=0.02, name="cantilever_beam")
