"""OFF mesh import/export. Ref ``kaolin/io/off.py:30``."""

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.rep.surface_mesh import SurfaceMesh

__all__ = ["import_mesh", "export_mesh"]


def import_mesh(path, with_face_colors=False):
    """Import an OFF file → unbatched SurfaceMesh. Ref :30."""
    with open(path, "r", errors="ignore") as f:
        tokens = []
        for line in f:
            line = line.split("#")[0].strip()
            if line:
                tokens.append(line)
    header = tokens[0]
    idx = 1
    if header.startswith("OFF") and len(header) > 3:
        counts = header[3:].split()
    elif header == "OFF":
        counts = tokens[idx].split()
        idx += 1
    else:
        counts = header.split()
    nv, nf = int(counts[0]), int(counts[1])
    verts = np.asarray([[float(x) for x in tokens[idx + i].split()[:3]]
                        for i in range(nv)], dtype=np.float32)
    idx += nv
    faces, colors = [], []
    for i in range(nf):
        parts = tokens[idx + i].split()
        c = int(parts[0])
        faces.append([int(x) for x in parts[1:1 + c]])
        if with_face_colors and len(parts) > 1 + c:
            colors.append([float(x) for x in parts[1 + c:1 + c + 3]])
    fsz = len(faces[0]) if faces else 3
    assert all(len(f) == fsz for f in faces), "heterogeneous OFF unsupported"
    kwargs = dict(vertices=jnp.asarray(verts),
                  faces=jnp.asarray(np.asarray(faces, dtype=np.int64)))
    if with_face_colors and colors:
        col = np.asarray(colors, dtype=np.float32)
        if col.max() > 1:
            col = col / 255.0
        kwargs["face_colors"] = jnp.asarray(
            np.repeat(col[:, None, :], fsz, axis=1))
    return SurfaceMesh(**kwargs)


def export_mesh(path, vertices, faces):
    """Write an OFF file."""
    v = np.asarray(vertices)
    f_np = np.asarray(faces)
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{v.shape[0]} {f_np.shape[0]} 0\n")
        for x in v:
            f.write(f"{x[0]} {x[1]} {x[2]}\n")
        for face in f_np:
            f.write(f"{len(face)} " + " ".join(str(i) for i in face) + "\n")


# named return container, matching the reference's ``return_type`` export
from collections import namedtuple  # noqa: E402
return_type = namedtuple("return_type", ["vertices", "faces", "face_colors"])
