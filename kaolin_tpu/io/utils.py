"""I/O helpers: error handlers and heterogeneous-mesh handlers.

TPU-native analog of reference ``kaolin/io/utils.py`` (handlers :48-62,
mesh_handler_naive_triangulate :62).
"""

import numpy as np

__all__ = [
    "NonHomogeneousMeshError",
    "heterogeneous_mesh_handler_skip",
    "heterogeneous_mesh_handler_naive_homogenize",
    "mesh_handler_naive_triangulate",
    "default_error_handler",
    "skip_error_handler",
    "ignore_error_handler",
    "create_missing_materials_error_handler",
]


class NonHomogeneousMeshError(Exception):
    """Faces have varying vertex counts and no handler was given."""


def default_error_handler(error, **kwargs):
    raise error


def skip_error_handler(error, **kwargs):
    pass


def ignore_error_handler(error, **kwargs):
    pass


def create_missing_materials_error_handler(error, **kwargs):
    """Returns a dummy material dict for missing materials."""
    from kaolin_tpu.io.obj import MaterialNotFoundError
    if isinstance(error, MaterialNotFoundError):
        return {"material_name": kwargs.get("material_name", "missing")}
    raise error


def heterogeneous_mesh_handler_skip(*args, **kwargs):
    """Skip heterogeneous meshes (returns None). Ref handler."""
    return None


def mesh_handler_naive_triangulate(vertices, face_vertex_counts, *features,
                                   face_assignments=None):
    """Triangulate a heterogeneous mesh by fanning each polygon
    (v0, v_i, v_i+1). Ref ``io/utils.py:62``.

    Args:
        vertices: (V, 3) array.
        face_vertex_counts: (F,) vertex count per face.
        *features: flat per-face-vertex index/feature arrays to re-index.
        face_assignments: optional dict name → (start, end) index pairs into
            faces, remapped to the triangulated face list.

    Returns:
        (vertices, face_vertex_counts(all 3), *new_features[, face_assignments])
    """
    counts = np.asarray(face_vertex_counts)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    tri_of_face = []
    new_features = [[] for _ in features]
    old_to_new_start = np.zeros(counts.shape[0] + 1, dtype=np.int64)
    num_tris = 0
    for i, c in enumerate(counts):
        old_to_new_start[i] = num_tris
        start = offsets[i]
        for k in range(1, c - 1):
            tri_of_face.append(i)
            for fi, feat in enumerate(features):
                f = np.asarray(feat)
                new_features[fi].extend([f[start], f[start + k], f[start + k + 1]])
        num_tris += max(c - 2, 0)
    old_to_new_start[-1] = num_tris
    new_counts = np.full(num_tris, 3, dtype=np.int64)
    outs = [np.asarray(vertices), new_counts]
    outs.extend(np.asarray(nf) for nf in new_features)
    if face_assignments is not None:
        # reference semantics (io/utils.py:62 + tests/io/test_utils.py:76-92):
        # 1D tensors are face-id LISTS (each id expands to its triangles);
        # 2D (N, 2) tensors are per-row (start, end) ranges remapped to the
        # new face indexing
        new_assign = {}
        for k, v in face_assignments.items():
            v = np.asarray(v)
            if v.ndim == 2:
                new_assign[k] = old_to_new_start[v]
            else:
                ids = []
                for fid in v:
                    ids.extend(range(old_to_new_start[fid],
                                     old_to_new_start[fid + 1]))
                new_assign[k] = np.asarray(ids, dtype=np.int64)
        outs.append(new_assign)
    return tuple(outs)


# legacy alias matching older reference naming
heterogeneous_mesh_handler_naive_homogenize = mesh_handler_naive_triangulate


def read_image(path):
    """Load an image file → float array in [0, 1], (H, W, C). Ref
    ``io/utils.py`` (read_image)."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    arr = np.array(Image.open(path))
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return jnp.asarray(arr)


def read_image_from_buffer(data):
    """Same as :func:`read_image` from an in-memory buffer."""
    import io as _io

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    arr = np.array(Image.open(_io.BytesIO(data)))
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return jnp.asarray(arr)


def write_image(image, path):
    """Save a float [0,1] or uint8 image array. Ref (write_image)."""
    import numpy as np
    from PIL import Image
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


class TextureExporter:
    """Callable that writes material textures next to an exported asset and
    returns the relative path to embed. Ref ``io/utils.py`` (TextureExporter).
    """

    def __init__(self, base_dir, relative_dir="textures", image_extension=".png"):
        self.base_dir = base_dir
        self.relative_dir = relative_dir
        self.image_extension = image_extension
        self._counts = {}

    def __call__(self, image, texture_name="texture"):
        import os
        idx = self._counts.get(texture_name, 0)
        self._counts[texture_name] = idx + 1
        suffix = "" if idx == 0 else f"_{idx}"
        rel = os.path.join(self.relative_dir,
                           f"{texture_name}{suffix}{self.image_extension}")
        full = os.path.join(self.base_dir, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        write_image(image, full)
        return rel
