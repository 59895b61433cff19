"""RKPM skinning weights (NVIDIA "Freeform" method).

TPU-native analog of reference ``kaolin/physics/simplicits/rkpm.py``
(SimplicitsRKPM :35, RKPM :295): skinning weights are eigenvectors of a
generalized eigenproblem over RKPM-assembled mass and elastic-Hessian
matrices.

First-order reproducing-kernel particle method with consistency correction:
``phi(x) = (C(x) @ P(nodes)ᵀ) * rbf(x)`` where C solves the per-point moment
system. Basis construction (FPS nodes, radii, eigenanalysis) runs host-side
in float64 (``scipy.linalg.eigh`` replaces torch.lobpcg — the matrices are
dense (num_nodes)² anyway); runtime weight evaluation is jnp (float32) with
analytic gradients via implicit differentiation of the moment solve.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["RKPM", "SimplicitsRKPM"]


def _rbf(x, nodes, radius):
    """exp(-(|x - n| / r)²) → (n, N). Works for numpy and jnp inputs."""
    mod = jnp if isinstance(x, jnp.ndarray) else np
    d2 = ((x[:, None, :] - nodes[None]) ** 2).sum(-1)
    return mod.exp(-d2 / radius[None] ** 2)


class RKPM:
    """First-order corrected RKPM basis. Ref :295."""

    def __init__(self, num_nodes, polynomial_degree=1):
        assert polynomial_degree == 1, "only degree 1 is supported"
        self.num_nodes = num_nodes
        self.num_dims = 3
        self.P = 4
        self.nodes = None
        self.radius = None

    def set_kernels(self, nodes, radius):
        self.nodes = np.asarray(nodes, dtype=np.float64)
        self.radius = np.asarray(radius, dtype=np.float64)
        self.num_nodes = self.nodes.shape[0]

    # -- numpy float64 host path (basis construction) --
    def func_x(self, x):
        return _rbf(np.asarray(x), self.nodes, self.radius)

    def dfunc_dx(self, x):
        x = np.asarray(x)
        disp = x[:, None, :] - self.nodes[None]
        f = self.func_x(x)
        return f[..., None] * (-2.0 / self.radius[None, :, None] ** 2) * disp

    @staticmethod
    def _poly(x):
        mod = jnp if isinstance(x, jnp.ndarray) else np
        return mod.concatenate([mod.ones_like(x[:, :1]), x], axis=1)

    def phi(self, x):
        """Corrected shape functions (n, N). Ref :phi."""
        x = np.asarray(x)
        f = self.func_x(x)
        pn = self._poly(self.nodes)                 # (N, P)
        pn_outer = np.einsum("Ni,Nj->Nij", pn, pn)  # (N, P, P)
        mx = np.einsum("nN,Nij->nij", f, pn_outer)  # (n, P, P)
        px = self._poly(x)
        cx = np.linalg.solve(mx, px[..., None])[..., 0]
        return (cx @ pn.T) * f

    def grad_phi(self, x):
        """d phi / dx (n, N, 3), analytic via implicit diff of the moment
        solve. Ref :grad_phi."""
        x = np.asarray(x)
        f = self.func_x(x)                  # (n, N)
        df = self.dfunc_dx(x)               # (n, N, 3)
        pn = self._poly(self.nodes)         # (N, P)
        pn_outer = np.einsum("Ni,Nj->Nij", pn, pn)
        mx = np.einsum("nN,Nij->nij", f, pn_outer)
        px = self._poly(x)
        cx = np.linalg.solve(mx, px[..., None])[..., 0]  # (n, P)
        # dPx/dx = [0; I]
        dpx = np.zeros((x.shape[0], self.P, 3))
        dpx[:, 1:, :] = np.eye(3)[None]
        # dMx/dx_d = Σ_N df[n,N,d] Pn_outer[N]
        dmx = np.einsum("nNd,Nij->nijd", df, pn_outer)   # (n, P, P, 3)
        rhs = dpx - np.einsum("nijd,nj->nid", dmx, cx)   # (n, P, 3)
        mx3 = np.broadcast_to(mx[:, None], (x.shape[0], 3) + mx.shape[1:])
        dcx = np.linalg.solve(mx3, np.moveaxis(rhs, -1, 1)[..., None])[..., 0]
        dcx = np.moveaxis(dcx, 1, -1)  # (n, P, 3)
        term1 = np.einsum("npd,Np->nNd", dcx, pn) * f[..., None]
        term2 = (cx @ pn.T)[..., None] * df
        return term1 + term2

    def __call__(self, x, evecs):
        return self.phi(x) @ np.asarray(evecs)


class SimplicitsRKPM:
    """RKPM skinning-weight field (SkinningFn-compatible). Ref :35."""

    def __init__(self, num_handles, num_nodes, radius_scale=1.0,
                 radius_init_kNN=2, radius_min="3x", num_points=None,
                 dtype=np.float64, bb_min=None, bb_max=None):
        self.num_points = num_points
        self.num_handles = num_handles - 1  # constant handle added separately
        self.num_nodes = num_nodes
        self.radius_scale = radius_scale
        self.radius_init_kNN = radius_init_kNN
        self.radius_min = radius_min
        self.rkpm = RKPM(num_nodes)
        self.evecs = np.zeros((num_nodes, self.num_handles))
        self.bb_min = np.zeros(3) if bb_min is None else np.asarray(bb_min)
        self.bb_max = np.ones(3) if bb_max is None else np.asarray(bb_max)

    def _offset_scale(self, pts):
        return (np.asarray(pts) - self.bb_min) / (self.bb_max - self.bb_min)

    def init(self, pts, yms, prs, rhos, appx_vol):
        """FPS node selection, radii, generalized eigenanalysis. Ref :104."""
        from scipy.linalg import eigh
        from scipy.spatial import cKDTree

        from kaolin_tpu.ops.pointcloud import farthest_point_sampling

        pts = self._offset_scale(pts).astype(np.float64)
        yms = np.asarray(yms, dtype=np.float64).reshape(-1)
        prs = np.asarray(prs, dtype=np.float64).reshape(-1)

        if pts.shape[0] < self.num_nodes:
            logger.warning("num_nodes > num_points; using all points")
            self.num_nodes = pts.shape[0]
            node_idx = np.arange(pts.shape[0])
        else:
            node_idx = np.asarray(farthest_point_sampling(
                jnp.asarray(pts.astype(np.float32))[None], self.num_nodes))[0]
        nodes = pts[node_idx]

        dists, _ = cKDTree(nodes).query(nodes, k=self.radius_init_kNN + 1)
        radius = dists[:, -1] * self.radius_scale
        if isinstance(self.radius_min, float):
            radius = np.clip(radius, self.radius_min, None)
        elif isinstance(self.radius_min, str):
            assert self.radius_min.endswith("x")
            factor = float(self.radius_min[:-1])
            pd, _ = cKDTree(pts).query(pts, k=2)
            radius = np.clip(radius, pd[:, -1].mean() * factor, None)
        self.rkpm.set_kernels(nodes, radius)

        if self.num_points is None:
            sample_idx = np.arange(pts.shape[0])
        else:
            sample_idx = np.asarray(farthest_point_sampling(
                jnp.asarray(pts.astype(np.float32))[None],
                self.num_points))[0]
        x = pts[sample_idx]
        yms_x, prs_x = yms[sample_idx], prs[sample_idx]

        m = self.get_mass_matrix(x)
        h = self.get_hessian_matrix(x, yms_x, prs_x)
        # smallest (num_handles + 1) generalized eigenpairs; drop the zero mode
        reg = 1e-10 * np.eye(m.shape[0])
        evals, evecs = eigh(h, m + reg,
                            subset_by_index=[0, self.num_handles])
        self.evecs = evecs[:, 1:]
        return self

    def get_mass_matrix(self, x):
        """M = ΦᵀΦ. Ref :186."""
        phi = self.rkpm.phi(x)
        return phi.T @ phi

    def get_hessian_matrix(self, x, yms, prs, reparameterize_lame=True):
        """Stiffness from basis gradients scaled by (λ + 4μ). Ref :203."""
        from kaolin_tpu.physics.materials.material_utils import to_lame
        gp = self.rkpm.grad_phi(x)  # (n, N, 3)
        n, nn, d = gp.shape
        j = np.transpose(gp, (0, 2, 1)).reshape(n * d, nn)
        mus, lams = to_lame(yms, prs)
        coeff = (lams + 4 * mus) if reparameterize_lame else (lams + 3 * mus)
        per_dim = np.repeat(np.asarray(coeff), d)
        return j.T @ (per_dim[:, None] * j)

    # -- SkinningFn protocol --
    def __call__(self, norm_pts):
        """Learned handles at NORMALIZED points → (n, H−1)."""
        return jnp.asarray(self.rkpm.phi(np.asarray(norm_pts)) @ self.evecs,
                           dtype=jnp.float32)

    def compute_skinning_weights(self, pts):
        w = self.rkpm.phi(self._offset_scale(pts)) @ self.evecs
        return jnp.asarray(
            np.concatenate([w, np.ones((w.shape[0], 1))], axis=1),
            dtype=jnp.float32)

    def compute_dwdx(self, pts):
        gp = self.rkpm.grad_phi(self._offset_scale(pts))  # (n, N, 3)
        grad = np.einsum("nNd,Nc->ncd", gp, self.evecs)
        grad = grad / (self.bb_max - self.bb_min)[None, None, :]
        zeros = np.zeros((grad.shape[0], 1, 3))
        return jnp.asarray(np.concatenate([grad, zeros], axis=1),
                           dtype=jnp.float32)
