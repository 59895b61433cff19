"""Tutorial: working with 3D gaussians.

TPU-native port of the reference notebook
``examples/tutorial/working_with_gaussians.ipynb``: build a
``GaussianSplatModel``, slice/concatenate it, transform it rigidly (with
Wigner-D spherical-harmonic rotation so view-dependent color follows the
object), voxelize it to an SPC shell, and densify its interior with
``sample_points_in_volume`` — the pipeline that feeds simulatable
gaussians.

Run: python examples/tutorial_working_with_gaussians.py   (CPU or TPU)
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.ops.conversions import gs_to_voxelgrid
from kaolin_tpu.ops.gaussians import (sample_points_in_volume,
                                      transform_gaussians)
from kaolin_tpu.rep import GaussianSplatModel


def _shell(n, rng, radius=0.4, center=(0.0, 0.0, 0.0)):
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (np.asarray(center, np.float32) + radius * d)


def main(smoke=False):
    n = 300 if smoke else 2000
    rng = np.random.RandomState(0)
    xyz = _shell(n, rng)
    gs = GaussianSplatModel(
        positions=jnp.asarray(xyz),
        orientations=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        scales=jnp.full((n, 3), 0.05),
        opacities=jnp.full((n,), 0.9),
        sh_coeff=jnp.concatenate(
            [jnp.full((n, 1, 3), 0.5),
             0.1 * jnp.asarray(rng.randn(n, 3, 3).astype(np.float32))],
            axis=1))                                   # SH degree 1
    assert len(gs.positions) == n

    # 1. container protocol: boolean-mask slicing and concatenation
    top = gs[np.asarray(xyz[:, 1] > 0)]
    bottom = gs[np.asarray(xyz[:, 1] <= 0)]
    both = GaussianSplatModel.cat([top, bottom])
    assert len(both.positions) == n

    # 2. rigid transform with SH rotation (Wigner-D): view-dependent color
    # follows the rotation
    angle = np.pi / 2
    rot = np.asarray([[1, 0, 0],
                      [0, np.cos(angle), -np.sin(angle)],
                      [0, np.sin(angle), np.cos(angle)]], np.float32)
    tfm = np.eye(4, dtype=np.float32)
    tfm[:3, :3] = rot
    tfm[:3, 3] = [0.0, 0.5, 0.0]
    new_pos, new_rot, new_scales, new_sh = transform_gaussians(
        gs.positions, gs.orientations, gs.scales, jnp.asarray(tfm),
        sh_coeff=gs.sh_coeff)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(new_pos, axis=0)),
        rot @ np.asarray(jnp.mean(gs.positions, axis=0))
        + np.asarray([0.0, 0.5, 0.0]), atol=1e-5)
    # degree-0 SH (view-independent) is rotation-invariant
    np.testing.assert_allclose(np.asarray(new_sh[:, 0]),
                               np.asarray(gs.sh_coeff[:, 0]), atol=1e-5)
    # degree-1 coefficients rotate but keep their norm (Wigner-D is
    # orthogonal per degree)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(new_sh[:, 1:], axis=1)),
        np.asarray(jnp.linalg.norm(gs.sh_coeff[:, 1:], axis=1)), atol=1e-4)

    # 3. shell voxelization (the first stage of the densifier)
    level = 4 if smoke else 5
    vox_coords, vox_opac = gs_to_voxelgrid(gs.positions, gs.scales,
                                           gs.orientations, gs.opacities,
                                           level=level)
    assert vox_coords.shape[0] > 0

    # 4. interior densification: volumetric physics samples inside the shell
    pts = sample_points_in_volume(
        np.asarray(gs.positions), np.asarray(gs.scales),
        np.asarray(gs.orientations), np.asarray(gs.opacities),
        octree_level=6, num_samples=128 if smoke else 1024,
        method="floodfill")
    r = np.linalg.norm(np.asarray(pts), axis=1)
    assert (r < 0.55).all(), "densified samples stay inside the shell"
    assert r.min() < 0.35, "densifier fills the INTERIOR, not just the shell"
    print("working_with_gaussians:",
          {"n": n, "voxels": int(vox_coords.shape[0]),
           "volume_samples": int(pts.shape[0])})
    return gs


if __name__ == "__main__":
    main()
