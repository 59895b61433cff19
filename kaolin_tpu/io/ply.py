"""PLY import/export — meshes, point clouds, and 3D gaussian splats.

TPU-native analog of reference ``kaolin/io/ply.py`` (gaussian clouds :31,
:143) — self-contained parser (ascii + binary little-endian), no plyfile
dependency.

Gaussian-splat property convention (INRIA 3DGS): x/y/z, opacity (logit),
scale_0..2 (log), rot_0..3 (wxyz quaternion), f_dc_0..2 + f_rest_* (SH).
"""

import struct

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.rep.surface_mesh import SurfaceMesh

__all__ = ["import_mesh", "import_pointcloud", "import_gaussians",
           "export_pointcloud", "export_gaussians", "read_ply", "write_ply"]

_PLY_TYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path):
    """Parse a PLY file → dict element_name → dict of property arrays
    (list properties → object arrays)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii", errors="ignore").splitlines()
    body = data[end:]

    fmt = "ascii"
    elements = []  # (name, count, [(prop_name, type, list_count_type|None)])
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append([parts[1], int(parts[2]), []])
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append((parts[4], parts[3], parts[2]))
            else:
                elements[-1][2].append((parts[2], parts[1], None))

    out = {}
    if fmt == "ascii":
        tokens = body.decode("ascii", errors="ignore").split()
        pos = 0
        for name, count, props in elements:
            cols = {p[0]: [] for p in props}
            for _ in range(count):
                for pname, ptype, ltype in props:
                    if ltype is not None:
                        n = int(tokens[pos]); pos += 1
                        cols[pname].append(
                            [float(tokens[pos + i]) for i in range(n)])
                        pos += n
                    else:
                        cols[pname].append(float(tokens[pos])); pos += 1
            out[name] = {k: (np.asarray(v) if not isinstance(v[0], list)
                             else np.asarray(v, dtype=object)
                             if any(len(x) != len(v[0]) for x in v)
                             else np.asarray(v))
                         for k, v in cols.items()} if count else {}
    elif fmt == "binary_little_endian":
        pos = 0
        for name, count, props in elements:
            has_list = any(p[2] is not None for p in props)
            if not has_list:
                dt = np.dtype([(p[0], "<" + _PLY_TYPES[p[1]]) for p in props])
                arr = np.frombuffer(body, dtype=dt, count=count, offset=pos)
                pos += dt.itemsize * count
                out[name] = {p[0]: np.ascontiguousarray(arr[p[0]])
                             for p in props}
            else:
                cols = {p[0]: [] for p in props}
                for _ in range(count):
                    for pname, ptype, ltype in props:
                        if ltype is not None:
                            lt = "<" + _PLY_TYPES[ltype]
                            n = int(np.frombuffer(body, lt, 1, pos)[0])
                            pos += np.dtype(lt).itemsize
                            vt = "<" + _PLY_TYPES[ptype]
                            cols[pname].append(
                                np.frombuffer(body, vt, n, pos).tolist())
                            pos += np.dtype(vt).itemsize * n
                        else:
                            vt = "<" + _PLY_TYPES[ptype]
                            cols[pname].append(
                                np.frombuffer(body, vt, 1, pos)[0])
                            pos += np.dtype(vt).itemsize
                out[name] = {k: np.asarray(v) for k, v in cols.items()}
    else:
        raise ValueError(f"unsupported PLY format {fmt}")
    return out


def import_mesh(path):
    """PLY mesh → SurfaceMesh (vertices + triangulated faces[+colors])."""
    data = read_ply(path)
    v = data["vertex"]
    vertices = np.stack([v["x"], v["y"], v["z"]], axis=-1).astype(np.float32)
    kwargs = dict(vertices=jnp.asarray(vertices))
    if "face" in data and data["face"]:
        key = "vertex_indices" if "vertex_indices" in data["face"] else "vertex_index"
        rows = data["face"][key]
        faces = []
        for r in rows:
            r = list(r)
            for i in range(1, len(r) - 1):
                faces.append([r[0], r[i], r[i + 1]])
        kwargs["faces"] = jnp.asarray(np.asarray(faces, dtype=np.int64))
    if all(c in v for c in ("red", "green", "blue")):
        col = np.stack([v["red"], v["green"], v["blue"]], -1).astype(np.float32)
        if col.max() > 1:
            col = col / 255.0
        kwargs["vertex_colors"] = jnp.asarray(col)
    return SurfaceMesh(**kwargs)


def import_pointcloud(path):
    """PLY → (points (N, 3), colors or None, normals or None)."""
    v = read_ply(path)["vertex"]
    pts = jnp.asarray(np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32))
    colors = None
    if all(c in v for c in ("red", "green", "blue")):
        col = np.stack([v["red"], v["green"], v["blue"]], -1).astype(np.float32)
        colors = jnp.asarray(col / 255.0 if col.max() > 1 else col)
    normals = None
    if all(c in v for c in ("nx", "ny", "nz")):
        normals = jnp.asarray(np.stack([v["nx"], v["ny"], v["nz"]], -1)
                              .astype(np.float32))
    return pts, colors, normals


def import_gaussians(path):
    """INRIA-format 3DGS ply → dict of arrays (positions, opacities (logit),
    scales (log), rotations (wxyz), sh coefficients). Ref :31."""
    v = read_ply(path)["vertex"]
    out = {
        "positions": np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32),
        "opacities": np.asarray(v["opacity"], dtype=np.float32),
        "scales": np.stack([v[f"scale_{i}"] for i in range(3)], -1)
        .astype(np.float32),
        "rotations": np.stack([v[f"rot_{i}"] for i in range(4)], -1)
        .astype(np.float32),
    }
    dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], -1).astype(np.float32)
    rest_keys = sorted([k for k in v if k.startswith("f_rest_")],
                       key=lambda s: int(s.split("_")[-1]))
    if rest_keys:
        rest = np.stack([v[k] for k in rest_keys], -1).astype(np.float32)
        nb = len(rest_keys) // 3
        rest = rest.reshape(-1, 3, nb).transpose(0, 2, 1)
        sh = np.concatenate([dc[:, None, :], rest], axis=1)
    else:
        sh = dc[:, None, :]
    out["sh_coeffs"] = sh
    return {k: jnp.asarray(val) for k, val in out.items()}


def write_ply(path, vertex_props, faces=None, binary=True):
    """Write a PLY file from a dict of per-vertex property arrays."""
    names = list(vertex_props.keys())
    arrays = [np.asarray(vertex_props[n], dtype=np.float32) for n in names]
    n = arrays[0].shape[0]
    with open(path, "wb") as f:
        hdr = ["ply",
               "format binary_little_endian 1.0" if binary else "format ascii 1.0",
               f"element vertex {n}"]
        hdr += [f"property float {name}" for name in names]
        if faces is not None:
            hdr += [f"element face {len(faces)}",
                    "property list uchar int vertex_indices"]
        hdr += ["end_header"]
        f.write(("\n".join(hdr) + "\n").encode("ascii"))
        table = np.stack(arrays, axis=-1)
        if binary:
            f.write(table.astype("<f4").tobytes())
            if faces is not None:
                for face in np.asarray(faces):
                    f.write(struct.pack("<B", len(face)))
                    f.write(np.asarray(face, dtype="<i4").tobytes())
        else:
            for row in table:
                f.write((" ".join(f"{x:g}" for x in row) + "\n").encode())
            if faces is not None:
                for face in np.asarray(faces):
                    f.write((f"{len(face)} "
                             + " ".join(str(i) for i in face) + "\n").encode())


def export_pointcloud(path, points, colors=None, normals=None):
    props = {"x": points[:, 0], "y": points[:, 1], "z": points[:, 2]}
    if normals is not None:
        props.update(nx=normals[:, 0], ny=normals[:, 1], nz=normals[:, 2])
    if colors is not None:
        c = np.asarray(colors)
        props.update(red=c[:, 0], green=c[:, 1], blue=c[:, 2])
    write_ply(path, props)


def export_gaussians(path, positions, opacities, scales, rotations, sh_coeffs):
    """Write INRIA-format 3DGS ply. Ref :143."""
    positions = np.asarray(positions)
    sh = np.asarray(sh_coeffs)
    props = {"x": positions[:, 0], "y": positions[:, 1], "z": positions[:, 2],
             "nx": np.zeros(positions.shape[0]),
             "ny": np.zeros(positions.shape[0]),
             "nz": np.zeros(positions.shape[0])}
    for i in range(3):
        props[f"f_dc_{i}"] = sh[:, 0, i]
    rest = sh[:, 1:].transpose(0, 2, 1).reshape(sh.shape[0], -1)
    for i in range(rest.shape[1]):
        props[f"f_rest_{i}"] = rest[:, i]
    props["opacity"] = np.asarray(opacities).reshape(-1)
    for i in range(3):
        props[f"scale_{i}"] = np.asarray(scales)[:, i]
    for i in range(4):
        props[f"rot_{i}"] = np.asarray(rotations)[:, i]
    write_ply(path, props)


def import_gaussiancloud(filename, apply_activations=True):
    """INRIA 3DGS ply → GaussianSplatModel; applies the standard activations
    (sigmoid opacity, exp scales, quaternion normalization) unless disabled.
    Ref :31."""
    from kaolin_tpu.rep.gaussians import GaussianSplatModel
    d = import_gaussians(filename)
    return GaussianSplatModel.from_gaussian_dict(d,
                                                 activated=apply_activations)


def export_gaussiancloud(file_path, positions, orientations, scales,
                         opacities, sh_coeff, overwrite=False):
    """Write a 3DGS ply in raw (pre-activation) space: log-scales, logit
    opacity, unnormalized (w, x, y, z) quaternions. Ref :143."""
    import os
    if not overwrite and os.path.exists(file_path):
        raise RuntimeError(f"Cannot overwrite: {file_path}")
    eps = 1e-7
    op = np.clip(np.asarray(opacities, dtype=np.float64).reshape(-1),
                 eps, 1 - eps)
    raw_op = np.log(op / (1.0 - op))
    raw_scales = np.log(np.clip(np.asarray(scales, dtype=np.float64),
                                eps, None))
    export_gaussians(file_path, positions, raw_op, raw_scales, orientations,
                     sh_coeff)


__all__ += ["import_gaussiancloud", "export_gaussiancloud"]


def __getattr__(name):
    if name == "GaussianSplatModel":
        from kaolin_tpu.rep.gaussians import GaussianSplatModel
        return GaussianSplatModel
    raise AttributeError(name)
