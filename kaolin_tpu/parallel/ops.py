"""Sharded geometry ops: batch-parallel metrics over a device mesh."""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from kaolin_tpu.metrics.pointcloud import chamfer_distance

__all__ = ["sharded_chamfer_distance"]


def sharded_chamfer_distance(mesh, p1, p2, w1=1.0, w2=1.0, squared=True):
    """Chamfer distance with the batch axis sharded over the mesh's 'dp'
    axis. Each device handles its local batch shard; no cross-device
    communication beyond layout."""

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("dp"), P("dp")), out_specs=P("dp"),
                       check_vma=False)
    def local(p1_, p2_):
        return chamfer_distance(p1_, p2_, w1=w1, w2=w2, squared=squared)

    return jax.jit(local)(p1, p2)


def sharded_dibr_rasterization(mesh, height, width, face_vertices_z,
                               face_vertices_image, face_features,
                               face_normals_z, **kwargs):
    """Multi-view DIB-R with the view/batch axis sharded over the mesh's
    'dp' axis — the standard multi-view inverse-rendering loop (one camera
    batch per device, no cross-device communication; gradients reduce over
    views outside). Geometry is replicated, views are sharded."""
    from jax.sharding import PartitionSpec as P

    from kaolin_tpu.render.mesh.dibr import dibr_rasterization

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False)
    def local(fvz, fvi, feats, nz):
        return dibr_rasterization(height, width, fvz, fvi, feats, nz,
                                  **kwargs)

    return jax.jit(local)(face_vertices_z, face_vertices_image,
                          face_features, face_normals_z)


__all__.append("sharded_dibr_rasterization")
