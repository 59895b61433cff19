"""Shared scene definitions for the golden-image corpus (generation +
regression test use the SAME code; goldens in tests/render/goldens/).

Six deterministic renders spanning the renderers without reference PNGs
(the two easy_render goldens vs reference GPU renders live in
test_easy_render.py): SPC raytrace depth, DefTet uv render, rasterize
normals/depth, DIB-R soft mask, ortho easy_render.
"""

import os

import numpy as np


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _sphere_mesh(n_lat=24, n_lon=32):
    import jax.numpy as jnp
    lat = np.linspace(0.15, np.pi - 0.15, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    th, ph = np.meshgrid(lat, lon, indexing="ij")
    v = np.stack([np.sin(th) * np.cos(ph), np.cos(th),
                  np.sin(th) * np.sin(ph)], -1).reshape(-1, 3)
    f = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a, b = i * n_lon + j, i * n_lon + (j + 1) % n_lon
            c, d = (i + 1) * n_lon + j, (i + 1) * n_lon + (j + 1) % n_lon
            f += [[a, b, c], [b, d, c]]
    return (jnp.asarray(v.astype(np.float32)),
            jnp.asarray(np.asarray(f, np.int32)))


def _camera(res=128):
    import jax.numpy as jnp
    from kaolin_tpu.render.camera import Camera
    return Camera.from_args(eye=jnp.asarray([1.6, 1.2, 1.8]),
                            at=jnp.zeros(3), up=jnp.asarray([0., 1., 0.]),
                            fov=0.8, width=res, height=res)


def render_spc_depth(res=128, level=7):
    import jax.numpy as jnp
    from kaolin_tpu.ops.spc import scan_octrees, unbatched_points_to_octree
    from kaolin_tpu.render.camera import generate_rays
    from kaolin_tpu.render.spc.raytrace import _raytrace_fixed

    rng = np.random.RandomState(0)
    grid = 2 ** level
    d = rng.randn(60_000, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = np.concatenate([d * 0.62, d * 0.615])
    q = np.unique(np.clip(((pts + 1) * 0.5 * grid).astype(np.int64), 0,
                          grid - 1), axis=0)
    octree = unbatched_points_to_octree(jnp.asarray(q.astype(np.int16)),
                                        level)
    _, pyramids, exsum = scan_octrees(
        octree, np.array([len(octree)], np.int32))
    o, v = generate_rays(_camera(res))
    ridx, _, t_in, _, valid, _, _ = _raytrace_fixed(
        jnp.asarray(octree), jnp.asarray(exsum), jnp.asarray(o),
        jnp.asarray(v), level, 8 * res * res)
    t = jnp.where(valid, t_in, jnp.inf)
    img = jnp.full((res * res,), jnp.inf).at[ridx].min(t)
    img = np.asarray(img.reshape(res, res))
    hit = np.isfinite(img)
    lo, hi = (img[hit].min(), img[hit].max()) if hit.any() else (0, 1)
    return np.where(hit, 1.0 - (img - lo) / max(hi - lo, 1e-6), 0.0)[..., None]


def render_deftet_uv(res=128):
    import jax.numpy as jnp
    from kaolin_tpu.ops.mesh import index_vertices_by_faces
    from kaolin_tpu.render.mesh.deftet import deftet_sparse_render

    verts, faces = _sphere_mesh()
    cam = _camera(res)
    vc = cam.extrinsics.transform(verts[None])
    vi = cam.intrinsics.transform(vc)[..., :2]
    fvz = index_vertices_by_faces(vc, faces)[..., 2]
    fvi = index_vertices_by_faces(vi, faces)
    uv = (verts[:, :2] + 1.0) * 0.5
    fuv = index_vertices_by_faces(uv[None], faces)

    xs = jnp.linspace(-1.0, 1.0, res)
    px, py = jnp.meshgrid(xs, xs, indexing="xy")
    pixel_coords = jnp.stack([px.reshape(-1), py.reshape(-1)], -1)[None]
    ranges = jnp.broadcast_to(
        jnp.asarray([float(jnp.min(fvz)), 0.0]), (1, res * res, 2))
    feats, face_idx = deftet_sparse_render(pixel_coords, ranges, fvz, fvi,
                                           fuv, knum=6)
    first = feats[:, :, 0, :]  # closest intersection's uv
    img = jnp.where((face_idx[:, :, 0] >= 0)[..., None], first, 0.0)
    return np.asarray(img.reshape(res, res, 2))


def render_rasterize_normals(res=128):
    import jax.numpy as jnp
    from kaolin_tpu.ops.mesh import face_normals as face_normals_fn
    from kaolin_tpu.ops.mesh import index_vertices_by_faces
    from kaolin_tpu.render.mesh.rasterization import rasterize

    verts, faces = _sphere_mesh()
    cam = _camera(res)
    vc = cam.extrinsics.transform(verts[None])
    vi = cam.intrinsics.transform(vc)[..., :2]
    fvz = index_vertices_by_faces(vc, faces)[..., 2]
    fvi = index_vertices_by_faces(vi, faces)
    normals = face_normals_fn(index_vertices_by_faces(verts[None], faces), unit=True)
    feat = jnp.broadcast_to(normals[:, :, None, :],
                            fvi.shape[:2] + (3, 3)) * 0.5 + 0.5
    img, _ = rasterize(res, res, fvz, fvi, feat, impl="xla")
    return np.asarray(img[0])


def render_soft_mask(res=128):
    import jax.numpy as jnp
    from kaolin_tpu.ops.mesh import index_vertices_by_faces
    from kaolin_tpu.render.mesh.dibr import dibr_rasterization

    verts, faces = _sphere_mesh(10, 14)
    cam = _camera(res)
    vc = cam.extrinsics.transform(verts[None] * 0.7)
    vi = cam.intrinsics.transform(vc)[..., :2]
    fvz = index_vertices_by_faces(vc, faces)[..., 2]
    fvi = index_vertices_by_faces(vi, faces)
    feat = jnp.ones(fvi.shape[:2] + (3, 1))
    nz = jnp.ones(fvi.shape[:2])
    _, soft, _ = dibr_rasterization(res, res, fvz, fvi, feat, nz,
                                    sigmainv=3000, rast_backend="xla")
    return np.asarray(soft[0])[..., None]


def render_ortho_easy(res=128):
    import jax.numpy as jnp
    from kaolin_tpu.render import easy_render
    from kaolin_tpu.render.camera import Camera
    from kaolin_tpu.rep import SurfaceMesh

    verts, faces = _sphere_mesh()
    mesh = SurfaceMesh(vertices=verts * 0.6, faces=faces)
    cam = Camera.from_args(eye=jnp.asarray([1.5, 1.0, 1.5]),
                           at=jnp.zeros(3), up=jnp.asarray([0., 1., 0.]),
                           fov_distance=1.2, width=res, height=res)
    out = easy_render.render_mesh(cam, mesh)
    return np.clip(np.asarray(out["render"][0]), 0.0, 1.0)


def render_sg_sphere(res=128):
    import jax.numpy as jnp
    from kaolin_tpu.render import easy_render
    from kaolin_tpu.render.easy_render import default_lighting
    from kaolin_tpu.rep import SurfaceMesh

    verts, faces = _sphere_mesh()
    mesh = SurfaceMesh(vertices=verts * 0.6, faces=faces)
    lighting = default_lighting()
    out = easy_render.render_mesh(_camera(res), mesh, lighting=lighting)
    return np.clip(np.asarray(out["diffuse"][0]), 0.0, 1.0)


def render_textured_easy(res=128):
    """Textured + PBR-material easy_render (texture sampling path; ref
    tests/python/kaolin/render/easy_render/test_mesh.py:66-121 exercises
    multiple materials/cameras per mesh)."""
    import jax.numpy as jnp
    from kaolin_tpu.render import easy_render
    from kaolin_tpu.render.materials import PBRMaterial
    from kaolin_tpu.rep import SurfaceMesh

    verts, faces = _sphere_mesh()
    nv = verts.shape[0]
    th = np.arctan2(np.asarray(verts)[:, 2], np.asarray(verts)[:, 0])
    ph = np.arccos(np.clip(np.asarray(verts)[:, 1], -1, 1))
    uvs = jnp.asarray(np.stack([(th / (2 * np.pi) + 0.5), ph / np.pi], -1)
                      .astype(np.float32))
    # deterministic checkerboard texture
    ij = np.indices((64, 64)).sum(axis=0)
    checker = np.where((ij // 8) % 2 == 0, 0.85, 0.2).astype(np.float32)
    tex = jnp.asarray(np.stack([checker, 0.5 * checker,
                                1.0 - checker], -1))
    mat = PBRMaterial(diffuse_texture=tex, material_name="checker")
    mesh = SurfaceMesh(vertices=verts * 0.6, faces=faces, uvs=uvs,
                       face_uvs_idx=faces, material_assignments=jnp.zeros(
                           (faces.shape[0],), jnp.int16),
                       materials=[mat])
    out = easy_render.render_mesh(_camera(res), mesh)
    return np.clip(np.asarray(out["render"][0]), 0.0, 1.0)


def render_easy_second_camera(res=128):
    """Same scene through a second camera pose + narrower fov (camera
    variation axis of the golden grid)."""
    import jax.numpy as jnp
    from kaolin_tpu.render import easy_render
    from kaolin_tpu.render.camera import Camera
    from kaolin_tpu.rep import SurfaceMesh

    verts, faces = _sphere_mesh()
    mesh = SurfaceMesh(vertices=verts * 0.6, faces=faces)
    cam = Camera.from_args(eye=jnp.asarray([-1.2, 1.8, 0.7]),
                           at=jnp.asarray([0.0, 0.1, 0.0]),
                           up=jnp.asarray([0., 1., 0.]),
                           fov=0.5, width=res, height=res)
    out = easy_render.render_mesh(cam, mesh)
    return np.clip(np.asarray(out["render"][0]), 0.0, 1.0)


def render_sh9_diffuse(res=128):
    """SH9 lighting path (render/lighting/sh.py) on interpolated normals."""
    import jax.numpy as jnp
    from kaolin_tpu.ops.mesh import (compute_vertex_normals, face_normals,
                                     index_vertices_by_faces)
    from kaolin_tpu.render.lighting import sh9_diffuse
    from kaolin_tpu.render.mesh import rasterize

    verts, faces = _sphere_mesh()
    cam = _camera(res)
    fn_w = face_normals(index_vertices_by_faces(verts[None], faces),
                        unit=True)
    fn_pc = jnp.broadcast_to(fn_w[:, :, None, :],
                             fn_w.shape[:2] + (3, 3))   # per-corner
    vn = compute_vertex_normals(faces, fn_pc,
                                num_vertices=verts.shape[0])[0]
    vc = cam.extrinsics.transform(verts * 0.6)[0]
    ndc = cam.intrinsics.transform(vc)[0]
    fv_img = index_vertices_by_faces(ndc[None, :, :2], faces)
    fv_z = index_vertices_by_faces(vc[None, :, 2:3], faces)[..., 0]
    fn = index_vertices_by_faces(vn[None], faces)
    img, _ = rasterize(res, res, fv_z, fv_img, fn)
    normals = img.reshape(-1, 3)
    normals = normals / jnp.clip(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-6, None)
    albedo = jnp.asarray([1.0, 0.9, 0.7])[None]
    shaded = sh9_diffuse(jnp.asarray([0.5, 0.7, 0.5]), normals,
                         albedo).reshape(res, res, 3)
    return np.clip(np.asarray(shaded), 0.0, 1.0)


RENDERS = {
    "spc_depth": render_spc_depth,
    "deftet_uv": render_deftet_uv,
    "rasterize_normals": render_rasterize_normals,
    "dibr_soft_mask": render_soft_mask,
    "ortho_easy_render": render_ortho_easy,
    "sg_diffuse": render_sg_sphere,
    "textured_easy_render": render_textured_easy,
    "easy_render_cam2": render_easy_second_camera,
    "sh9_diffuse": render_sh9_diffuse,
}


def save_goldens():
    from PIL import Image
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in RENDERS.items():
        img = fn()
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        elif arr.shape[-1] == 2:
            arr = np.concatenate([arr, np.zeros_like(arr[..., :1])], -1)
        Image.fromarray(arr).save(os.path.join(GOLDEN_DIR, f"{name}.png"))
        print("wrote", name, arr.shape)


if __name__ == "__main__":
    save_goldens()
