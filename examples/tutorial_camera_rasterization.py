"""Tutorial: cameras + differentiable rasterization.

TPU-native port of the reference notebook
``examples/tutorial/camera_and_rasterization.ipynb``: build a pinhole
:class:`~kaolin_tpu.render.camera.Camera` from look-at arguments, transform a
mesh into camera/image space, rasterize per-vertex colors, and move the
camera — everything inside one jitted program per frame.

Run: python examples/tutorial_camera_rasterization.py   (CPU or TPU)
"""

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.ops.mesh import face_normals, index_vertices_by_faces
from kaolin_tpu.render.camera import Camera
from kaolin_tpu.render.mesh import rasterize


def make_icosphere(subdiv=2):
    """Small analytic test mesh (icosahedron, loop-subdivided by midpoint)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    for _ in range(subdiv):
        mids = {}
        nv = list(v)
        nf = []

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in mids:
                m = v[a] + v[b]
                m /= np.linalg.norm(m)
                mids[key] = len(nv)
                nv.append(m)
            return mids[key]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(nv, np.float32)
        f = np.asarray(nf, np.int64)
    return jnp.asarray(v), jnp.asarray(f)


def render(camera, vertices, faces, colors):
    """One differentiable rasterization pass (ref notebook cell 5-7)."""
    # camera-space positions and image-plane (NDC) coordinates
    # extrinsics/intrinsics transforms are camera-batched: (V, 3) → (1, V, 3)
    cam_pos = camera.extrinsics.transform(vertices)            # (1, V, 3)
    ndc = camera.intrinsics.transform(cam_pos)                 # (1, V, 3)
    # index_vertices_by_faces is batched (B, V, D) -> (B, F, 3, D)
    face_cam = index_vertices_by_faces(cam_pos, faces)         # (1, F, 3, 3)
    face_ndc = index_vertices_by_faces(ndc[..., :2], faces)
    face_col = index_vertices_by_faces(colors[None], faces)    # (1, F, 3, 3)

    image, face_idx = rasterize(
        camera.height, camera.width,
        face_cam[..., 2],            # (1, F, 3) camera-space z
        face_ndc,                    # (1, F, 3, 2)
        face_col)                    # (1, F, 3, 3)
    return image[0], face_idx[0]


def main(smoke=False):
    res = 64 if smoke else 256
    vertices, faces = make_icosphere(1 if smoke else 2)
    colors = vertices * 0.5 + 0.5                              # position-tint

    camera = Camera.from_args(eye=jnp.asarray([2.0, 1.0, 2.0]),
                              at=jnp.zeros(3),
                              up=jnp.asarray([0.0, 1.0, 0.0]),
                              fov=np.pi * 45 / 180,
                              width=res, height=res)
    render_jit = jax.jit(render, static_argnums=())

    image, face_idx = render_jit(camera, vertices, faces, colors)
    hit = int(jnp.sum(face_idx >= 0))
    print(f"frame 0: {hit} covered pixels / {res * res}")
    assert hit > res * res * 0.05

    # move the camera like the notebook: orbit + zoom (new Camera objects
    # re-trace nothing — the jitted program is shape-stable)
    for i, ang in enumerate(np.linspace(0, np.pi / 2, 4)[1:], 1):
        eye = jnp.asarray([2 * np.cos(ang), 1.0, 2 * np.sin(ang)],
                          jnp.float32)
        cam_i = Camera.from_args(eye=eye, at=jnp.zeros(3),
                                 up=jnp.asarray([0.0, 1.0, 0.0]),
                                 fov=np.pi * 45 / 180, width=res, height=res)
        image, face_idx = render_jit(cam_i, vertices, faces, colors)
        print(f"frame {i}: {int(jnp.sum(face_idx >= 0))} covered pixels")

    # the pass is differentiable end-to-end: gradient of the mean image
    # w.r.t. vertex colors flows through the rasterizer
    g = jax.grad(lambda c: jnp.mean(render(camera, vertices, faces, c)[0]))(
        colors)
    gn = float(jnp.linalg.norm(g))
    print(f"|dL/dcolors| = {gn:.2e}")
    assert np.isfinite(gn) and gn > 0

    # normals for shading-style postprocessing (ref notebook final cells)
    fn = face_normals(index_vertices_by_faces(vertices[None], faces),
                      unit=True)[0]
    assert fn.shape == (faces.shape[0], 3)
    print("done")
    return image


if __name__ == "__main__":
    main()
