"""Spc container — batched structured point clouds.

TPU-native analog of reference ``kaolin/rep/spc.py:24``: holds octrees +
lengths and lazily computes (max_level, pyramids, exsum, point_hierarchies).
Functional style: derived attributes are cached on the instance (host-side
construction metadata, not traced state).
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["Spc"]


class Spc:
    """Batched byte-packed octrees. Ref :24."""

    KEYS = {"octrees", "lengths", "max_level", "pyramids", "exsum",
            "point_hierarchies"}

    def __init__(self, octrees, lengths, max_level=None, pyramids=None,
                 exsum=None, point_hierarchies=None):
        self.octrees = jnp.asarray(octrees)
        self.lengths = jnp.asarray(lengths)
        self._max_level = max_level
        self._pyramids = pyramids
        self._exsum = exsum
        self._point_hierarchies = point_hierarchies

    @classmethod
    def from_features(cls, feature_grids, masks=None):
        """Dense feature grids → (Spc, features). Ref :from_features."""
        from kaolin_tpu.ops.spc import feature_grids_to_spc
        octrees, lengths, features = feature_grids_to_spc(feature_grids, masks)
        return cls(octrees, lengths), features

    @classmethod
    def from_list(cls, octrees_list):
        """Batch a list of single octree byte tensors. Ref :232."""
        if len(octrees_list) == 0:
            raise ValueError("from_list requires at least one octree")
        octs = [jnp.asarray(o, jnp.uint8).reshape(-1) for o in octrees_list]
        lengths = jnp.asarray([o.shape[0] for o in octs], jnp.int32)
        return cls(jnp.concatenate(octs), lengths)

    @classmethod
    def make_dense(cls, level):
        """Fully-dense octree of ``level`` subdivisions (every node has all
        8 children): sum_{l<level} 8^l bytes of 0xFF. Ref :144."""
        if level <= 0:
            raise ValueError("level must be positive")
        num_nodes = sum(8 ** l for l in range(level))
        octree = jnp.full((num_nodes,), 0xFF, jnp.uint8)
        return cls(octree, jnp.asarray([num_nodes], jnp.int32))

    def _apply_scan_octrees(self):
        from kaolin_tpu.ops.spc import scan_octrees
        max_level, pyramids, exsum = scan_octrees(self.octrees, self.lengths)
        self._max_level = max_level
        self._pyramids = pyramids
        self._exsum = exsum

    def _apply_generate_points(self):
        from kaolin_tpu.ops.spc import generate_points
        self._point_hierarchies = generate_points(self.octrees, self.pyramids,
                                                  self.exsum)

    @property
    def max_level(self):
        if self._max_level is None:
            self._apply_scan_octrees()
        return self._max_level

    @property
    def pyramids(self):
        if self._pyramids is None:
            self._apply_scan_octrees()
        return self._pyramids

    @property
    def exsum(self):
        if self._exsum is None:
            self._apply_scan_octrees()
        return self._exsum

    @property
    def point_hierarchies(self):
        if self._point_hierarchies is None:
            self._apply_generate_points()
        return self._point_hierarchies

    @property
    def batch_size(self):
        return self.lengths.shape[0]

    def __len__(self):
        return self.batch_size

    def to_dict(self, keys=None):
        keys = self.KEYS if keys is None else keys
        return {k: getattr(self, k) for k in keys}

    def num_points(self, lod):
        """Points at a given level of detail → (B,)."""
        return jnp.asarray(np.asarray(self.pyramids)[:, 0, lod])

    def __repr__(self):
        return f"Spc(batch_size={self.batch_size}, max_level={self.max_level})"
